"""Parser matrix for se3ds_tpu.config (the gin replacement).

Every construct the reference configs use must parse; gin features with
no counterpart here (scopes, evaluated references, include) must be
rejected loudly — a silently misread binding is a config bug that shows
up only as wrong training behaviour.
"""

import glob
import os

import pytest

from se3ds_tpu import config as config_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = '/root/reference/configs'


def setup_function(_):
  config_lib.clear_config()


def test_parses_all_repo_gin_files():
  paths = glob.glob(os.path.join(REPO, 'configs', '**', '*.gin'),
                    recursive=True)
  assert paths, 'no gin files found in configs/'
  for path in paths:
    config_lib.clear_config()
    with open(path) as f:
      config_lib.parse_config(f.read())
    assert config_lib._BINDINGS, path


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason='reference checkout not present')
def test_parses_reference_gin_files_verbatim():
  """The reference's own gin files (configs/{lowres,highres}/*.gin) must
  parse: config-schema parity is a stated requirement (SURVEY §5)."""
  paths = glob.glob(os.path.join(REFERENCE, '**', '*.gin'), recursive=True)
  assert paths
  for path in paths:
    config_lib.clear_config()
    with open(path) as f:
      config_lib.parse_config(f.read())
    b = config_lib._BINDINGS
    # Spot-check the semantically load-bearing bindings.
    assert b['GANManager']['d_step_per_g_step'] == 2
    assert b['GAN']['lambda_depth'] == 100.0
    assert b['ResNetGenerator']['resnet_version'] == '101'
    ref = b['GANManager']['generator_fn']
    assert isinstance(ref, config_lib.ConfigurableReference)
    assert ref.name == 'image_models.ResNetGenerator'


def test_macros_define_and_use():
  config_lib.parse_config('image_size = 256\n'
                          'GAN.image_size = %image_size\n'
                          'R2RImageDataset.image_size = %image_size\n')
  assert config_lib._BINDINGS['GAN']['image_size'] == 256
  assert config_lib._BINDINGS['R2RImageDataset']['image_size'] == 256


def test_undefined_macro_raises():
  with pytest.raises(KeyError, match='Undefined macro %image_size'):
    config_lib.parse_config('GAN.image_size = %image_size')


def test_multiline_list_and_tuple():
  config_lib.parse_config(
      'GAN.dims = [1,\n'
      '            2,\n'
      '            3]\n'
      'GAN.betas = (0.5,\n'
      '             0.999)\n')
  assert config_lib._BINDINGS['GAN']['dims'] == [1, 2, 3]
  assert config_lib._BINDINGS['GAN']['betas'] == (0.5, 0.999)


def test_hash_inside_quoted_string_is_not_a_comment():
  config_lib.parse_config("GAN.tag = 'exp#7'  # trailing comment\n")
  assert config_lib._BINDINGS['GAN']['tag'] == 'exp#7'


def test_bare_identifier_is_a_string_but_structured_garbage_raises():
  config_lib.parse_config('GAN.mode = train')
  assert config_lib._BINDINGS['GAN']['mode'] == 'train'
  with pytest.raises(ValueError, match='Cannot parse gin value'):
    config_lib.parse_config('GAN.dims = [1, 2,]x')


def test_scoped_target_rejected_loudly():
  with pytest.raises(ValueError, match='scopes are not supported'):
    config_lib.parse_config('train/GAN.g_lr = 0.1')


def test_scoped_reference_rejected_loudly():
  with pytest.raises(ValueError, match='Scoped gin references'):
    config_lib.parse_config('GAN.generator_fn = @train/ResNetGenerator')


def test_evaluated_reference_rejected_loudly():
  with pytest.raises(ValueError, match='Evaluated gin references'):
    config_lib.parse_config('GAN.generator = @ResNetGenerator()')


def test_include_rejected_loudly():
  with pytest.raises(ValueError, match='include.*not supported'):
    config_lib.parse_config("include 'configs/base.gin'")


def test_import_lines_ignored():
  config_lib.parse_config('import se3ds.models\n'
                          'from se3ds import trainers\n'
                          'GAN.seed = 1\n')
  assert config_lib._BINDINGS['GAN']['seed'] == 1


def test_unterminated_binding_raises():
  with pytest.raises(ValueError, match='Unterminated binding'):
    config_lib.parse_config('GAN.dims = [1, 2,')


def test_garbage_line_raises():
  with pytest.raises(ValueError, match='Cannot parse gin line'):
    config_lib.parse_config('this is not gin')
