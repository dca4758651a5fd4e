"""Pallas TPU kernel for the z-buffer point splat.

Strategy: XLA's data-dependent scatters serialise on TPU (~7-9 ms per
scatter at 1M points). Instead, points are sorted by destination pixel
(fast on TPU: one multi-payload `lax.sort`) and a Pallas kernel streams
the sorted points chunk-by-chunk (BlockSpec pipelining, no manual DMA)
while keeping the FULL image z-buffer resident in VMEM as the output
block (constant index_map — the classic cross-grid-step accumulator
pattern). For each chunk it walks the (contiguous, because sorted) range
of 128-lane pixel rows the chunk touches and folds the chunk's points
into those rows with dense masked min/max reductions on the VPU — an
(CHUNK, 128) equality mask selects each point's pixel lane, replacing
the scatter entirely.

Cost is worst-case bounded: consecutive chunks touch disjoint row
windows (sorted order) except at boundaries, so the total number of
row-iterations is <= num_rows + num_chunks for ANY point distribution.

MEASURED (v5e via relay, 1M points -> 1024x512, scripts/
bench_splat_modes.py): pallas 20.5 ms vs 'fast' packed-scatter 15.9 ms
vs exact 'scatter' 35.8 ms. The round-2 ~10 ms estimate assumed the
sort was ~2 ms and the masked reduction ran at element-throughput;
neither holds on this hardware, so 'fast' remains the default splat.
Round 4 additionally falsified the "loop/dynamic-store overhead"
theory of the walk's cost: folding 8 aligned rows per loop iteration
(static unroll, one (8, 128) store per accumulator — `rows_per_block`)
cut iterations ~2.4x and dynamic stores 8x yet measured 20.5 -> 20.5 ms
(exact kernel 27.7 -> 26.7) — the walk is VPU-work-bound, and blocking
trades overhead for redundant row reductions one-for-one. The kernels
stay as working, tested infrastructure (bit-identity re-proven on
device after the rewrite); see PERF.md "Row-block kernel walk" for the
full negative-result record.

Semantics match `splat.project_to_feat_fast`: exact f32 min-depth buffer
plus a packed (inverted depth bucket | feature bytes) uint32 winner per
pixel (reference semantics: point_cloud_utils.py:90-183).

A second kernel, `project_to_feat_pallas_exact` (round 3), carries the
EXACT reference semantics instead — exact 0.1 m collision window on the
raw depth + per-channel f32 feature max, bit-identical to the 'scatter'
and 'sorted' modes. It rides a 2-key (pixel, clipped-depth) sort: within
each pixel run the minimum depth arrives FIRST, so the z-buffer entry is
final by the time any point of that pixel is folded in, and the window +
per-channel max resolve in the same single pass — replacing the 'sorted'
mode's associative scans (the dominant cost of the exact XLA paths; see
PERF.md sort-cost matrix).

This is the v2 formulation: v1 (round 2) used `pltpu.make_async_copy`
with per-tile variable-length point ranges and a sublane-flattening
epilogue, both of which crashed the axon remote Mosaic service
(HTTP 500, no diagnostics). v2 uses only BlockSpec streaming, row-wise
(1, 128) stores, and dynamic-bound `fori_loop` — constructs the Mosaic
frontend handles conservatively. `pallas_available()` probes the
toolchain once per process and splat_mode='pallas' degrades to 'fast'
automatically when the probe fails.

VMEM budget: the resident z/packed buffers cost num_pixels * 8 bytes
(4 MB at 1024x512); images above ~1.5M pixels fall back to 'fast'.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Points processed per grid step. Multiple of the (8, 128) f32 tile.
CHUNK = 512
_LANES = 128
# Resident VMEM for the two accumulators is num_pixels * 8 bytes; cap so
# the kernel + double-buffered input stream stays well under ~16 MB.
_MAX_VMEM_PIXELS = 1536 * 1024
# Aligned rows folded per loop iteration (8 = one f32 sublane tile).
_ROW_BLOCK = 8


def _rows_per_block(num_rows: int) -> int:
  """Row-block width for the kernel walk: 8 when the image is 8-row
  alignable (every production pano is), else the per-row path."""
  return _ROW_BLOCK if num_rows % _ROW_BLOCK == 0 else 1


def _splat_kernel(flat_ref, depth_ref, packed_ref,  # (1, CHUNK, 1) in VMEM
                  zbuf_ref, pbuf_ref,  # (1, ROWS, 128) resident outputs
                  *, depth_scale: float, num_rows: int, rows_per_block: int):
  # Note: packed values are carried as *sign-flipped int32* (u32 ^ 2^31)
  # because Mosaic has no unsigned reductions; i32 max on the flipped
  # values == u32 max on the originals.
  i = pl.program_id(1)

  @pl.when(i == 0)
  def _init():
    zbuf_ref[...] = jnp.full_like(zbuf_ref, depth_scale)
    pbuf_ref[...] = jnp.full_like(pbuf_ref, -(2**31))

  flat = flat_ref[0, :, :]  # (CHUNK, 1)
  rows_pt = flat // _LANES  # (CHUNK, 1)
  cols_pt = flat % _LANES
  lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, _LANES), 1)

  # Loop-invariant: each point's lane-selected value arrays. Points that
  # miss a lane carry the identity (depth_scale / INT32_MIN).
  col_eq = cols_pt == lane  # (CHUNK, 128)
  zsel = jnp.where(col_eq, depth_ref[0, :, :],
                   jnp.asarray(depth_scale, jnp.float32))
  psel = jnp.where(col_eq, packed_ref[0, :, :],
                   jnp.asarray(-(2**31), jnp.int32))

  # The chunk is sorted, so it spans the contiguous row range
  # [rows_pt[0], rows_pt[-1]]. Sentinel-padded points (flat ==
  # num_pixels) sort to the end; derive row_last from the last
  # NON-sentinel point so the boundary chunk's row walk stops at the
  # valid data — taking it from rows_pt[-1] would scan every row up to
  # num_rows (~6 ms wasted at 1024x512 for sparse clouds). An
  # all-sentinel chunk yields row_last = -1 and the loop body never runs.
  row_first = flat_ref[0, 0, 0] // _LANES
  row_last = jnp.max(
      jnp.where(flat < num_rows * _LANES, rows_pt, -1))

  # Row-BLOCK walk (round 4): the per-row loop was overhead-bound
  # (~1.5 us/iteration of loop + (1, 128) dynamic-store cost, not VPU
  # throughput — PERF.md), so the loop now advances `rows_per_block`
  # ALIGNED rows at a time: W statically-unrolled masked reductions per
  # iteration and ONE (W, 128) read-modify-write store per accumulator.
  # Iterations drop from rows_touched + chunks to rows_touched/W +
  # chunks; rows in the block the chunk doesn't touch reduce to the
  # identity and the min/max merge leaves them unchanged (exactness is
  # untouched — the same per-row reductions run, just batched).
  W = rows_per_block

  def body(rb, _):
    base = rb * W
    zrows = []
    prows = []
    for dr in range(W):
      rmask = rows_pt == (base + dr)
      zrows.append(jnp.min(
          jnp.where(rmask, zsel, jnp.asarray(depth_scale, jnp.float32)),
          axis=0, keepdims=True))
      prows.append(jnp.max(
          jnp.where(rmask, psel, jnp.asarray(-(2**31), jnp.int32)),
          axis=0, keepdims=True))
    zblk = zrows[0] if W == 1 else jnp.concatenate(zrows, axis=0)
    pblk = prows[0] if W == 1 else jnp.concatenate(prows, axis=0)
    zbuf_ref[0, pl.ds(base, W), :] = jnp.minimum(
        zbuf_ref[0, pl.ds(base, W), :], zblk)
    pbuf_ref[0, pl.ds(base, W), :] = jnp.maximum(
        pbuf_ref[0, pl.ds(base, W), :], pblk)
    return 0

  # row_last == -1 (all-sentinel chunk) gives hi = 0 <= lo: zero
  # iterations, as before.
  jax.lax.fori_loop(row_first // W, row_last // W + 1, body, 0,
                    unroll=False)


def _splat_sorted_points(sflat, sdepth, spacked, num_pixels: int,
                         depth_scale: float, interpret: bool = False):
  """Runs the streaming kernel over pre-sorted, padded point arrays.

  Args:
    sflat: (B, Mpad) int32 sorted flat pixel indices (sentinel
      num_pixels for padding/invalid), Mpad % CHUNK == 0.
    sdepth: (B, Mpad) float32 depths (rides the same sort order).
    spacked: (B, Mpad) int32 sign-flipped packed payloads.
  """
  batch, num_padded = sflat.shape
  assert num_padded % CHUNK == 0, (num_padded, CHUNK)
  assert num_pixels % _LANES == 0, num_pixels
  num_rows = num_pixels // _LANES
  num_chunks = num_padded // CHUNK

  grid = (batch, num_chunks)
  point_spec = lambda: pl.BlockSpec((1, CHUNK, 1), lambda b, i: (b, i, 0),
                                    memory_space=pltpu.VMEM)
  zbuf, pbuf = pl.pallas_call(
      functools.partial(_splat_kernel, depth_scale=depth_scale,
                        num_rows=num_rows,
                        rows_per_block=_rows_per_block(num_rows)),
      grid=grid,
      in_specs=[point_spec(), point_spec(), point_spec()],
      out_specs=[
          pl.BlockSpec((1, num_rows, _LANES), lambda b, i: (b, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, num_rows, _LANES), lambda b, i: (b, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_shape=[
          jax.ShapeDtypeStruct((batch, num_rows, _LANES), jnp.float32),
          jax.ShapeDtypeStruct((batch, num_rows, _LANES), jnp.int32),
      ],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary', 'arbitrary')),
      interpret=interpret,
  )(sflat[:, :, None], sdepth[:, :, None], spacked[:, :, None])
  return (zbuf.reshape(batch, num_pixels),
          pbuf.reshape(batch, num_pixels))


def _exact_splat_kernel(flat_ref, cdepth_ref, rdepth_ref, packed_ref,
                        zbuf_ref, *fbuf_refs,
                        depth_scale: float, num_rows: int, channels: int,
                        output_void_class: float, rows_per_block: int):
  """Exact-window segmented reduction over (pixel, depth)-sorted points.

  Reference semantics (point_cloud_utils.py:157-176) in ONE streaming
  pass: points arrive grouped by pixel and depth-ascending within each
  group (the 2-key sort), so by the time ANY point of a pixel is folded
  in, the pixel's z-buffer entry already holds its FINAL minimum depth —
  the 0.1 m collision window (DEPTH_COLLISION_TOLERANCE) and the
  per-channel feature max can therefore be resolved in the same pass,
  with no second visit and no associative scans. Accumulators are
  VMEM-resident across the sequential grid, which also carries pixel
  runs straddling chunk boundaries.
  """
  from se3ds_tpu.ops import splat as splat_lib
  i = pl.program_id(1)

  @pl.when(i == 0)
  def _init():
    zbuf_ref[...] = jnp.full_like(zbuf_ref, depth_scale)
    for fb in fbuf_refs:
      fb[...] = jnp.full_like(fb, output_void_class)

  flat = flat_ref[0, :, :]  # (CHUNK, 1)
  rows_pt = flat // _LANES
  cols_pt = flat % _LANES
  lane = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, _LANES), 1)
  col_eq = cols_pt == lane  # (CHUNK, 128), loop-invariant

  zsel = jnp.where(col_eq, cdepth_ref[0, :, :],
                   jnp.asarray(depth_scale, jnp.float32))
  rdepth = rdepth_ref[0, :, :]  # (CHUNK, 1) raw depth (window check)
  packed = packed_ref[0, :, :]
  feat_pt = [((packed >> (8 * (channels - 1 - c))) & 0xFF).astype(jnp.float32)
             for c in range(channels)]  # each (CHUNK, 1)
  neg = jnp.float32(-3.4e38)  # identity below any byte/void value

  row_first = flat_ref[0, 0, 0] // _LANES
  row_last = jnp.max(jnp.where(flat < num_rows * _LANES, rows_pt, -1))
  tol = jnp.float32(splat_lib.DEPTH_COLLISION_TOLERANCE)

  # Row-BLOCK walk (round 4, see _splat_kernel): W aligned rows per
  # iteration, statically unrolled, one (W, 128) read-modify-write per
  # accumulator. Same per-row math — exactness is untouched.
  W = rows_per_block

  def body(rb, _):
    base = rb * W
    zblk_old = zbuf_ref[0, pl.ds(base, W), :]  # (W, 128)
    zrows = []
    frows = [[] for _ in range(channels)]
    for dr in range(W):
      rmask = rows_pt == (base + dr)
      zc = jnp.min(
          jnp.where(rmask, zsel, jnp.asarray(depth_scale, jnp.float32)),
          axis=0, keepdims=True)  # (1, 128)
      newz = jnp.minimum(zblk_old[dr:dr + 1, :], zc)
      zrows.append(newz)
      # newz IS the final per-pixel minimum for every pixel this chunk
      # touches in this row (sorted order: the min point came first), so
      # the reference window test `raw depth < min + 0.1` is exact here.
      win = col_eq & rmask & (rdepth < newz + tol)  # (CHUNK, 128)
      for c in range(channels):
        frows[c].append(
            jnp.max(jnp.where(win, feat_pt[c], neg), axis=0, keepdims=True))
    zbuf_ref[0, pl.ds(base, W), :] = (
        zrows[0] if W == 1 else jnp.concatenate(zrows, axis=0))
    for c in range(channels):
      fblk = frows[c][0] if W == 1 else jnp.concatenate(frows[c], axis=0)
      fbuf_refs[c][0, pl.ds(base, W), :] = jnp.maximum(
          fbuf_refs[c][0, pl.ds(base, W), :], fblk)
    return 0

  jax.lax.fori_loop(row_first // W, row_last // W + 1, body, 0,
                    unroll=False)


def _exact_splat_sorted_points(sflat, scdepth, srdepth, spacked,
                               num_pixels: int, depth_scale: float,
                               channels: int, output_void_class: float,
                               interpret: bool = False):
  """Runs the exact-window kernel over pre-sorted, padded point arrays."""
  batch, num_padded = sflat.shape
  assert num_padded % CHUNK == 0, (num_padded, CHUNK)
  assert num_pixels % _LANES == 0, num_pixels
  num_rows = num_pixels // _LANES
  num_chunks = num_padded // CHUNK

  grid = (batch, num_chunks)
  point_spec = lambda: pl.BlockSpec((1, CHUNK, 1), lambda b, i: (b, i, 0),
                                    memory_space=pltpu.VMEM)
  acc_spec = lambda: pl.BlockSpec((1, num_rows, _LANES), lambda b, i: (b, 0, 0),
                                  memory_space=pltpu.VMEM)
  acc_shape = lambda: jax.ShapeDtypeStruct((batch, num_rows, _LANES),
                                           jnp.float32)
  out = pl.pallas_call(
      functools.partial(_exact_splat_kernel, depth_scale=depth_scale,
                        num_rows=num_rows, channels=channels,
                        output_void_class=output_void_class,
                        rows_per_block=_rows_per_block(num_rows)),
      grid=grid,
      in_specs=[point_spec() for _ in range(4)],
      out_specs=[acc_spec() for _ in range(1 + channels)],
      out_shape=[acc_shape() for _ in range(1 + channels)],
      compiler_params=pltpu.CompilerParams(
          dimension_semantics=('arbitrary', 'arbitrary')),
      interpret=interpret,
  )(sflat[:, :, None], scdepth[:, :, None], srdepth[:, :, None],
    spacked[:, :, None])
  zbuf = out[0].reshape(batch, num_pixels)
  fbuf = jnp.stack([f.reshape(batch, num_pixels) for f in out[1:]], axis=-1)
  return zbuf, fbuf


def project_to_feat_pallas_exact(
    transformed_coords: jnp.ndarray,
    feats: jnp.ndarray,
    height: int,
    width: int,
    depth_scale: float,
    input_void_class: float,
    output_void_class: float = 0.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Streaming-Pallas splat with EXACT `project_to_feat` semantics.

  Bit-identical to the exact 'scatter'/'sorted' modes (reference
  point_cloud_utils.py:90-183): exact f32 min-depth buffer, exact 0.1 m
  collision window on the raw depth, per-channel f32 feature max — but
  resolved with one 2-key `lax.sort` (~5 ms at 1M points, PERF.md
  sort-cost matrix) plus one linear streaming pass, instead of the
  'sorted' mode's associative scans (~53 ms) or the 'scatter' mode's
  serialised scatters (~36 ms).

  Requires integer feature values in [0, 255] (true for RGB and
  semantic classes — the same contract as 'fast'/'pallas'), <=3
  channels, width a multiple of 128, and accumulators that fit VMEM;
  anything else falls back to the exact scatter path, preserving
  semantics.
  """
  from se3ds_tpu.ops import splat as splat_lib

  if feats.ndim not in (2, 3):
    raise ValueError(
        f'feats should have shape (N, M) or (N, M, C), got {feats.shape}')
  is_scalar_feat = feats.ndim == 2
  if is_scalar_feat:
    feats = feats[..., None]
  channels = feats.shape[-1]
  num_pixels = height * width
  # VMEM budget: (1 + channels) f32 accumulators resident.
  if (channels > 3 or num_pixels % _LANES != 0
      or num_pixels * (1 + channels) > 4 * _MAX_VMEM_PIXELS // 2
      or transformed_coords.shape[-1] == 0):
    out = splat_lib.project_to_feat(
        transformed_coords, feats, height, width, depth_scale,
        input_void_class, output_void_class)
    return out[0], (out[1][..., 0] if is_scalar_feat else out[1])
  dtype = transformed_coords.dtype
  feats = feats.astype(dtype)
  batch_size, _, num_points = transformed_coords.shape

  flat, depth, valid = splat_lib.pixel_coords(
      transformed_coords, feats, height, width, input_void_class)

  fbytes = jnp.clip(feats, 0.0, 255.0).astype(jnp.uint32)
  packed = jnp.zeros_like(flat, dtype=jnp.uint32)
  for c in range(channels):
    packed = packed | (fbytes[..., c] << (8 * (channels - 1 - c)))
  # <= 24 feature bits: positive as int32, no sign flip needed.
  packed_i = packed.astype(jnp.int32)
  clipped = jnp.minimum(depth, depth_scale).astype(jnp.float32)
  # Invalid points carry the sentinel pixel index and sort to the end;
  # give padding a raw depth past any window so a boundary chunk's
  # masked reductions stay inert even before the row-walk cutoff.
  far = jnp.float32(depth_scale + 1.0)

  pad = (-num_points) % CHUNK

  def one_batch(flat_b, cdepth_b, rdepth_b, packed_b):
    flat_p = jnp.concatenate(
        [flat_b, jnp.full((pad,), num_pixels, jnp.int32)])
    cdepth_p = jnp.concatenate(
        [cdepth_b, jnp.full((pad,), depth_scale, jnp.float32)])
    rdepth_p = jnp.concatenate([rdepth_b, jnp.full((pad,), far, jnp.float32)])
    packed_p = jnp.concatenate([packed_b, jnp.zeros((pad,), jnp.int32)])
    return jax.lax.sort([flat_p, cdepth_p, rdepth_p, packed_p], num_keys=2)

  sflat, scd, srd, spk = jax.vmap(one_batch)(
      flat, clipped, depth.astype(jnp.float32), packed_i)
  zbuf, fbuf = _exact_splat_sorted_points(
      sflat, scd, srd, spk, num_pixels, depth_scale, channels,
      float(output_void_class), interpret=interpret)
  projected_depth = (jnp.clip(zbuf, 0.0, depth_scale) / depth_scale
                     ).reshape(batch_size, height, width)
  projected_feat = fbuf.astype(dtype).reshape(
      batch_size, height, width, channels)
  if is_scalar_feat:
    projected_feat = projected_feat[..., 0]
  return projected_depth, projected_feat


# Manual per-kernel caches: a trace-time deferral must NOT stick.
_PALLAS_OK = {'pallas': None, 'pallas_exact': None}


def _probe(mode: str, fn, degrade_to: str) -> bool:
  """Shared once-per-process Mosaic probe (see pallas_available)."""
  if _PALLAS_OK[mode] is not None:
    return _PALLAS_OK[mode]
  import logging
  import numpy as np
  log = logging.getLogger('se3ds_tpu')
  try:
    from jax._src import core as _core  # no public trace-state API
    trace_clean = _core.trace_state_clean()
  except Exception:  # API drift: assume clean and let the probe decide
    trace_clean = True
  if not trace_clean:
    log.warning(
        "Pallas splat probe skipped: first called during jit tracing, "
        "where it cannot compile+fetch. Degrading THIS program to %r"
        " (not cached); call the *_available() probe eagerly once to "
        'enable the kernel (SE3DSModel.__init__ does).', degrade_to)
    return False
  try:
    coords = jnp.stack([
        jnp.linspace(-0.5, 0.5, CHUNK), jnp.linspace(-0.5, 0.5, CHUNK),
        jnp.full((CHUNK,), 2.0), jnp.ones((CHUNK,))])[None]
    feats = jnp.ones((1, CHUNK, 3))
    zbuf, _ = fn(coords, feats, 8, _LANES,
                 depth_scale=20.0, input_void_class=-1.0)
    np.asarray(zbuf)  # host fetch forces the real (relay) compile
    _PALLAS_OK[mode] = True
  except Exception as e:  # MosaicError/XlaRuntimeError shapes vary by build
    log.warning(
        'Pallas splat kernel unavailable on this toolchain (%s: %s); '
        'splat_mode=%r degrades to %r.',
        type(e).__name__, str(e)[:200], mode, degrade_to)
    _PALLAS_OK[mode] = False
  return _PALLAS_OK[mode]


def pallas_available() -> bool:
  """True when the Mosaic toolchain can compile+run the splat kernel.

  Probes once per process with one CHUNK of points on the default backend
  (compile + execute + fetch, so relay-deferred Mosaic failures are also
  caught). Callers use this to degrade splat_mode='pallas' to the packed
  'fast' scatter instead of raising (see geometry.
  project_feats_to_equirectangular).

  The probe needs a real dispatch + host fetch, which is impossible while
  an outer jit is TRACING (geometry picks the splat fn at trace time, and
  under a trace the probe's arrays become tracers). In that case this
  returns False for the current trace WITHOUT caching, and logs how to
  get the kernel: probe eagerly first — SE3DSModel.__init__ does this
  automatically for splat_mode='pallas'.
  """
  return _probe('pallas', project_to_feat_pallas, 'fast')


def pallas_exact_available() -> bool:
  """Probe for the exact-window kernel; degrades to 'scatter' (exact)."""
  return _probe('pallas_exact', project_to_feat_pallas_exact, 'scatter')


def project_to_feat_pallas(
    transformed_coords: jnp.ndarray,
    feats: jnp.ndarray,
    height: int,
    width: int,
    depth_scale: float,
    input_void_class: float,
    output_void_class: float = 0.0,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Streaming-Pallas splat with `project_to_feat_fast` semantics.

  Requires width to be a multiple of 128 (all production pano sizes),
  <=3 integer feature channels in [0, 255], and height*width small
  enough for the VMEM-resident accumulators; anything else falls back to
  the packed XLA scatter.
  """
  from se3ds_tpu.ops import splat as splat_lib

  if feats.ndim not in (2, 3):
    raise ValueError(
        f'feats should have shape (N, M) or (N, M, C), got {feats.shape}')
  is_scalar_feat = feats.ndim == 2
  if is_scalar_feat:
    feats = feats[..., None]
  channels = feats.shape[-1]
  num_pixels = height * width
  # num_points == 0: a zero-step grid would leave the output buffers
  # uninitialised; the XLA path returns the correct all-void image.
  if (channels > 3 or num_pixels % _LANES != 0
      or num_pixels > _MAX_VMEM_PIXELS
      or transformed_coords.shape[-1] == 0):
    out = splat_lib.project_to_feat_fast(
        transformed_coords, feats, height, width, depth_scale,
        input_void_class, output_void_class)
    return out[0], (out[1][..., 0] if is_scalar_feat else out[1])
  dtype = transformed_coords.dtype
  feats = feats.astype(dtype)
  batch_size, _, num_points = transformed_coords.shape

  flat, depth, valid = splat_lib.pixel_coords(
      transformed_coords, feats, height, width, input_void_class)

  qdepth = jnp.clip(depth / depth_scale * 255.0, 0.0, 255.0).astype(
      jnp.uint32)
  packed = (255 - qdepth) << 24
  fbytes = jnp.clip(feats, 0.0, 255.0).astype(jnp.uint32)
  for c in range(channels):
    packed = packed | (fbytes[..., c] << (8 * (channels - 1 - c)))
  packed = jnp.where(valid, packed, 0)
  depth_clipped = jnp.where(valid, jnp.minimum(depth, depth_scale),
                            depth_scale).astype(jnp.float32)

  pad = (-num_points) % CHUNK

  def one_batch(flat_b, depth_b, packed_b):
    flat_p = jnp.concatenate(
        [flat_b, jnp.full((pad,), num_pixels, jnp.int32)])
    depth_p = jnp.concatenate(
        [depth_b, jnp.full((pad,), depth_scale, jnp.float32)])
    packed_p = jnp.concatenate([packed_b, jnp.zeros((pad,), jnp.uint32)])
    # Sign-flip for Mosaic (no unsigned reductions); undo after the kernel.
    packed_i = jax.lax.bitcast_convert_type(
        packed_p ^ jnp.uint32(1 << 31), jnp.int32)
    return jax.lax.sort([flat_p, depth_p, packed_i], num_keys=1)

  sflat, sdepth, spacked = jax.vmap(one_batch)(flat, depth_clipped, packed)
  zbuf, pbuf = _splat_sorted_points(sflat, sdepth, spacked, num_pixels,
                                    depth_scale, interpret=interpret)
  pbuf = jax.lax.bitcast_convert_type(pbuf, jnp.uint32) ^ jnp.uint32(1 << 31)
  projected_depth = (jnp.clip(zbuf, 0.0, depth_scale) / depth_scale
                     ).reshape(batch_size, height, width)
  got_point = pbuf != 0
  cols = []
  for c in range(channels):
    col = (pbuf >> (8 * (channels - 1 - c))) & 0xFF
    cols.append(jnp.where(got_point, col.astype(dtype),
                          jnp.asarray(output_void_class, dtype)))
  projected_feat = jnp.stack(cols, axis=-1).reshape(
      batch_size, height, width, channels)
  if is_scalar_feat:
    projected_feat = projected_feat[..., 0]
  return projected_depth, projected_feat
