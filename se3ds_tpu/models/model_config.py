"""Config object for SE3DS inference models (reference model_config.py)."""

import dataclasses
from typing import Optional

from se3ds_tpu import constants


@dataclasses.dataclass
class SE3DSConfig:
  """Parameters used to configure SE3DS models."""
  # Number of independent scenes served in lockstep through one program.
  # The reference requires 1 (models.py:95-96); here any N >= 1 works —
  # each batch element owns its own point-cloud memory slice. Splat
  # guidance is bit-identical to N single-scene models; generator floats
  # agree to ~1e-6 (XLA tiles convs per batch size) —
  # tests/test_inference.py::test_batched_serving_*.
  batch_size: int = 1
  ckpt_path: Optional[str] = constants.CKPT_UNSEEN
  hidden_dims: int = 128
  random_noise: bool = True
  z_dim: int = 32
  circular_pad: bool = True
  depth_scale: float = constants.DEPTH_SCALE
  gen_dims: int = 128
  image_height: int = 512
  h_fov: float = 0.17
  resnet_version: str = '101'
  use_blurred_mask: bool = True
  # TPU-native additions.
  memory_frames: int = constants.PANO_VIDEO_LENGTH  # memory capacity in frames
  compute_dtype: str = 'float32'  # 'bfloat16' for faster inference
  # Guidance-splat winner selection (ops/splat.py; ms/splat measured
  # on-chip at 1M points -> 1024x512, PERF.md round-4 mode menu;
  # deviation bounds from PERF.md "Fast-splat deviation"):
  #   'scatter'    exact reference semantics, 35.9 ms
  #   'sorted'     exact, sort-based, 55.6 ms (general f32 features)
  #   'sorted_packed' exact for byte-valued feats (RGB / class ids —
  #                all product data), 36.4 ms: the round-3 "near-'fast'"
  #                estimate did NOT survive measurement — the segmented
  #                window passes dominate, landing it at 'scatter' cost
  #   'fast'       packed single-scatter, 16.1 ms — DEFAULT. Deviates
  #                from exact only at multi-point collision windows:
  #                on an adversarial dense-overlap scene ~18-23% of
  #                valid pixels differ (mean |delta| 2-11/255 by
  #                texture); depth output is always exact. The fastest
  #                EXACT mode costs +72% (pallas_exact below), so the
  #                default keeps speed; one knob away from exact.
  #   'fast_exact' exact 0.1 m window + packed tie-break, 23.5 ms —
  #                bit-identical to 'scatter' at single-point windows.
  #   'pallas'     Mosaic kernel with 'fast' semantics, 20.5 ms
  #                (auto-degrades; loses to 'fast' — kept as tested
  #                infrastructure).
  #   'pallas_exact' Mosaic kernel bit-identical to 'scatter' (exact
  #                window + per-channel max), 27.7 ms — the FASTEST
  #                EXACT mode; degrades to 'scatter'. Eval default.
  splat_mode: str = 'fast'
  # Fold spectral norms into kernels once at load (bitwise-equal at eval,
  # models/folding.py) instead of re-normalising every weight per forward.
  fold_spectral: bool = True
  # Statically drop the pole-masked rows from the RGB point cloud at
  # memory-write time. `add_to_memory(mask_blurred=True)` blanks the
  # top/bottom 1/8th of the RGB pano to INVALID_RGB_VALUE *before*
  # unprojection (reference models.py:211-213), so those rows' points
  # are void forever and every splat mode skips them — the reference
  # itself discards them dynamically with a boolean gather
  # (models.py:229-237). Dropping them statically keeps shapes jit-able
  # and shrinks the RGB cloud ~25% (H - 2*int(H/8) + 1 rows survive),
  # cutting RGB-splat cost proportionally. Bit-exact on every output
  # (tests/test_inference.py). Requires mask_blurred=True on every
  # add_to_memory call; set False to allow unmasked memory writes.
  pole_compact: bool = True
  # Compute the semantic guidance projection. The generator never
  # consumes it (its inputs are the RGB/depth/mask guidance only,
  # reference image_models.py:157-162); it exists solely to fill
  # OutputData.proj_semantic. RGB-only serving clients can set False to
  # skip the whole semantic splat (~9 ms/frame at 1024x512, PERF.md):
  # proj_semantic/pred_semantic then come back all-zero while every
  # other output is bit-identical.
  project_semantics: bool = True
  # Donate the model-owned memory buffers (and the previous-frame
  # feedback) to the mutating programs (`add_to_memory`,
  # `add_preds_to_memory=True`, `predict_trajectory`): XLA aliases the
  # donated input with the returned state, making the per-frame
  # dynamic_update_slice writes in place instead of copying the
  # full-capacity buffers (~170 MB at 8-frame 1024x512 capacity) every
  # call. `get_memory_state()`/`set_memory_state()` copy at the API
  # boundary, so client-held states stay valid either way; set False
  # only if client code holds `get_memory_state(copy=False)` views
  # across mutating calls.
  donate_memory: bool = True
  # Behaviour when a memory write would exceed `memory_frames` capacity:
  #   'strict' (default) raise from the host API before dispatch — the
  #            documented fixed-capacity contract (the reference instead
  #            grows its memory unboundedly until OOM, models.py:239-245).
  #   'ring'   overwrite the OLDEST frame's slots (sliding window over
  #            the last `memory_frames` observations) — unbounded
  #            streaming trajectories at constant HBM. Below capacity the
  #            two modes are bit-identical; after a wrap the memory holds
  #            exactly the most recent `memory_frames` frames
  #            (tests/test_inference.py::test_ring_memory_*).
  memory_mode: str = 'strict'


def get_config() -> SE3DSConfig:
  """Returns the Val-Unseen config for SE3DS."""
  return SE3DSConfig(ckpt_path=constants.CKPT_UNSEEN, resnet_version='101')


def get_re10k_config() -> SE3DSConfig:
  """Returns the RE10K config for SE3DS."""
  return SE3DSConfig(ckpt_path=constants.CKPT_RE10K, resnet_version='101',
                     use_blurred_mask=False,
                     # The RE10K flow writes perspective-derived panos
                     # with mask_blurred=False (no pole blanking), so
                     # the compacted RGB layout does not apply.
                     pole_compact=False)


def get_test_config() -> SE3DSConfig:
  """Returns config used for unit tests."""
  return SE3DSConfig(ckpt_path=None, hidden_dims=4, z_dim=4, gen_dims=4,
                     image_height=32, memory_frames=3,
                     resnet_version='tiny',
                     # Unit tests exercise mask_blurred=False round-trips,
                     # which compaction (correctly) rejects.
                     pole_compact=False)
