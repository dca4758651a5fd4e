"""Helper: imports the reference TF models with gin/tfa stubbed."""
import os, sys, types, tempfile
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

def import_reference_models():
  if 'se3ds.models.image_models' in sys.modules:
    from se3ds.models import image_models
    return image_models
  import tensorflow as tf
  gin = types.ModuleType('gin')
  def configurable(fn=None, **kw):
    if callable(fn):
      return fn
    return lambda f: f
  gin.configurable = configurable
  sys.modules.setdefault('gin', gin)
  tfa = types.ModuleType('tensorflow_addons')
  tfa_image = types.ModuleType('tensorflow_addons.image')
  tfa_image.interpolate_bilinear = None
  tfa_layers = types.ModuleType('tensorflow_addons.layers')
  class InstanceNorm(tf.keras.layers.Layer):
    def build(self, shape):
      c = shape[-1]
      self.gamma = self.add_weight('gamma', shape=(c,), initializer='ones')
      self.beta = self.add_weight('beta', shape=(c,), initializer='zeros')
    def call(self, x):
      m, v = tf.nn.moments(x, axes=[1, 2], keepdims=True)
      return (x - m) * tf.math.rsqrt(v + 1e-3) * self.gamma + self.beta
  tfa_layers.InstanceNormalization = InstanceNorm
  tfa.image = tfa_image
  tfa.layers = tfa_layers
  sys.modules['tensorflow_addons'] = tfa
  sys.modules['tensorflow_addons.image'] = tfa_image
  sys.modules['tensorflow_addons.layers'] = tfa_layers
  link = tempfile.mkdtemp()
  os.symlink('/root/reference', os.path.join(link, 'se3ds'))
  sys.path.insert(0, link)
  from se3ds.models import image_models
  return image_models
