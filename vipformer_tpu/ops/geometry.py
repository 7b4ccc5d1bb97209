"""Point-cloud geometry kernels, TPU-first.

Functional equivalents of the reference's geometry ops
(`/root/reference/vipformer/model/pointcloud/utils.py:6-242`), redesigned for
XLA on TPU:

* pairwise squared distance is one MXU matmul plus rank-1 row/col norms,
* kNN is that matmul followed by `jax.lax.top_k`,
* farthest point sampling is a `lax.fori_loop` with a fixed trip count over a
  dense [B, N] distance state (the reference runs a Python loop of `npoint`
  CUDA launches; here the whole chain compiles into a single fused loop),
* gathers use `jnp.take_along_axis` (XLA dynamic-gather) instead of flat
  index arithmetic.

Everything is pure, shape-static and differentiable-where-meaningful, so any
op can sit inside a pjit'd train step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


def square_distance(src: Array, dst: Array) -> Array:
    """Pairwise squared euclidean distances.

    Args:
      src: [B, N, C]
      dst: [B, M, C]
    Returns:
      [B, N, M] squared distances.

    Matches reference `square_distance` (`pointcloud/utils.py:122-141`):
    ``|x|^2 + |y|^2 - 2<x,y>`` with the inner product on the MXU. Inputs are
    promoted to f32 for the norm/matmul so bf16 activations don't lose the
    cancellation precision.
    """
    src = src.astype(jnp.float32)
    dst = dst.astype(jnp.float32)
    # HIGHEST: TPU's default f32 dot is a single bf16 pass, whose ~0.5%
    # error is enough to flip kNN selections at the k boundary; the C=3
    # contraction is tiny so full precision is effectively free
    inner = jnp.einsum(
        "bnc,bmc->bnm", src, dst, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s2 = jnp.sum(src * src, axis=-1)[:, :, None]
    d2 = jnp.sum(dst * dst, axis=-1)[:, None, :]
    return s2 + d2 - 2.0 * inner


def index_points(points: Array, idx: Array) -> Array:
    """Batched gather: points [B, N, C], idx [B, ...] -> [B, ..., C].

    Equivalent of reference `index_points` (`pointcloud/utils.py:88-104`).
    On TPU large row gathers dispatch to the MXU one-hot kernel
    (ops/pallas/gather.py) — XLA's scalar-driven gather is the slowest op
    of the patch pipeline otherwise.
    """
    B = points.shape[0]
    C = points.shape[-1]
    flat_idx = idx.reshape(B, -1)  # [B, K]

    from vipformer_tpu.ops.pallas.gather import (
        gather_rows_pallas,
        mxu_gather_enabled,
    )

    if mxu_gather_enabled(points, flat_idx.shape[1]):
        out = gather_rows_pallas(
            points, flat_idx, 8, jax.default_backend() != "tpu"
        )
    else:
        out = jnp.take_along_axis(points, flat_idx[:, :, None], axis=1)
    return out.reshape(*idx.shape, C)


# None = auto (packed-key sort on TPU, exact top_k elsewhere)
KNN_METHOD: str | None = None


def knn(k: int, points: Array, queries: Array, method: str | None = None) -> Array:
    """Indices of the k nearest `points` for each of the `queries`.

    Args:
      k: neighborhood size (static).
      points: [B, N, C] reference set.
      queries: [B, S, C] query set.
      method: 'exact' (top_k over f32 distances), 'packed' (single-operand
        sort over distance-bits|index int32 keys), or None -> module
        default / auto.
    Returns:
      int32 [B, S, k] neighbor indices (sorted nearest-first).

    Equivalent of reference `knn_point` (`pointcloud/utils.py:107-119`):
    full pairwise distance matrix (MXU) + k-selection.

    The packed method exploits that non-negative f32 bit patterns compare
    like the floats: truncate the low ceil(log2 N) mantissa bits of each
    distance and splice the point index in, then ONE single-operand sort
    yields the k nearest with indices decoded from the keys — no pair-sort
    index tracking. Deviation from exact: two candidates whose distances
    agree to ~2^-(23-log2 N) relative get ordered by index instead of
    distance — below f32 noise for these workloads, and deterministic.
    """
    method = method or KNN_METHOD
    if method is None:
        method = "pallas" if jax.default_backend() == "tpu" else "exact"
    if method == "pallas":
        from vipformer_tpu.ops.pallas.knn import knn_pallas
        from vipformer_tpu.ops.pallas.shard import data_sharded_call

        # xyz operands are batch-sharded only (never feature-sharded, even
        # under TP), so the kernel runs per data shard on any mesh
        interp = jax.default_backend() != "tpu"
        return data_sharded_call(
            lambda p, q: knn_pallas(k, p, q, interpret=interp),
            (points[..., :3], queries[..., :3]),
            (True, True),
            True,
        )
    d = square_distance(queries, points)
    if method == "exact":
        _, idx = jax.lax.top_k(-d, k)
        return idx.astype(jnp.int32)
    n = points.shape[1]
    idx_bits = max(1, (n - 1).bit_length())
    mask = (1 << idx_bits) - 1
    bits = jax.lax.bitcast_convert_type(d, jnp.int32)  # monotone for d >= 0
    iota = jax.lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    keys = (bits & ~mask) | iota
    skeys = jax.lax.sort(keys, dimension=-1)
    return (skeys[..., :k] & mask).astype(jnp.int32)


# None = auto (Pallas kernel on TPU, lax.fori_loop elsewhere); tests and
# benchmarks can force either path.
USE_PALLAS_FPS: bool | None = None


def _pallas_fps_enabled() -> bool:
    if USE_PALLAS_FPS is not None:
        return USE_PALLAS_FPS
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(
    pts: Array, npoint: int, key: Array | None = None
) -> Array:
    """Iterative farthest point sampling.

    Args:
      pts: [B, N, C] points; only the first 3 channels (xyz) drive distances.
      npoint: number of samples (static).
      key: optional PRNG key for a random start index per batch element
        (matching the reference's `torch.randint` start,
        `pointcloud/utils.py:71`). `None` starts at index 0 for determinism.
    Returns:
      int32 [B, npoint] indices of the sampled points.

    TPU design: a single `lax.fori_loop` with fixed trip count `npoint`.
    State is (centroids [B, npoint], min-distance [B, N], farthest [B]); each
    step is one gather, one fused subtract-square-reduce over [B, N, 3], an
    elementwise min, and an argmax — all VPU work, no host sync, no dynamic
    shapes. Reference semantics: `pointcloud/utils.py:56-85`.
    """
    B, N, _ = pts.shape
    xyz = pts[..., :3].astype(jnp.float32)

    if key is None:
        farthest0 = jnp.zeros((B,), dtype=jnp.int32)
    else:
        farthest0 = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)

    if _pallas_fps_enabled():
        from vipformer_tpu.ops.pallas.fps import fps_pallas
        from vipformer_tpu.ops.pallas.shard import data_sharded_call

        return data_sharded_call(
            lambda x, f0: fps_pallas(
                x, npoint, f0,
                interpret=jax.default_backend() != "tpu",
            ),
            (xyz, farthest0),
            (True, True),
            True,
        )

    centroids0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    distance0 = jnp.full((B, N), 1e10, dtype=jnp.float32)

    def body(i, state):
        centroids, distance, farthest = state
        centroids = centroids.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(
            xyz, farthest[:, None, None], axis=1
        )  # [B, 1, 3]
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)  # [B, N]
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids, _, _ = jax.lax.fori_loop(
        0, npoint, body, (centroids0, distance0, farthest0)
    )
    return centroids


def fps(pts: Array, npoint: int, key: Array | None = None) -> Array:
    """FPS returning the sampled points themselves: [B, npoint, C].

    Reference `fps` (`pointcloud/utils.py:41-53`).
    """
    if pts.shape[-1] == 3:
        return farthest_point_sample_with_centers(pts, npoint, key)[1]
    idx = farthest_point_sample(pts, npoint, key)
    return index_points(pts, idx)


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample_with_centers(
    pts: Array, npoint: int, key: Array | None = None
) -> tuple[Array, Array]:
    """FPS indices plus the sampled points' xyz in one pass.

    Returns (idx int32 [B, npoint], centers [B, npoint, 3] in pts.dtype).

    On TPU the centers come straight out of the FPS kernel's registers
    (ops/pallas/fps.py return_centers) — the follow-up
    `index_points(pts, idx)` gather they replace runs through XLA's
    scalar gather on a minor-dim-3 array, measured 69 us at B=128 and a
    superlinear 293 us at B=256 on v5e (2.3% lane occupancy at C=3).
    Values are bit-identical: the kernel banks the same f32 coordinates
    the one-hot distance update already selected.
    """
    B, N, _ = pts.shape
    xyz = pts[..., :3].astype(jnp.float32)
    if key is None:
        farthest0 = jnp.zeros((B,), dtype=jnp.int32)
    else:
        farthest0 = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)

    if _pallas_fps_enabled():
        from vipformer_tpu.ops.pallas.fps import fps_pallas
        from vipformer_tpu.ops.pallas.shard import data_sharded_call

        idx, centers = data_sharded_call(
            lambda x, f0: fps_pallas(
                x, npoint, f0,
                interpret=jax.default_backend() != "tpu",
                return_centers=True,
            ),
            (xyz, farthest0),
            (True, True),
            (True, True),
        )
        return idx, centers.astype(pts.dtype)

    idx = farthest_point_sample(pts, npoint, key)
    centers = jnp.take_along_axis(
        pts[..., :3], idx[:, :, None], axis=1
    )
    return idx, centers


def divide_patches(
    points: Array,
    num_groups: int,
    group_size: int,
    key: Array | None = None,
    neighbor_dtype=None,
    compat: bool = False,
) -> tuple[Array, Array]:
    """FPS centers -> kNN neighborhoods -> center-normalized local patches.

    Args:
      points: [B, N, C] (C >= 3; extra channels, e.g. rgb, ride along).
      num_groups: number of patches G (static).
      group_size: points per patch S (static).
      key: optional PRNG key for the FPS random start.
      compat: reproduce the reference implementation's normalization
        bit-for-bit (see below) instead of its documented intent. Required
        when loading checkpoints trained with the reference code
        (`/root/reference/README.md:92-95`).
    Returns:
      neighbors: [B, G, S, C] with xyz channels centered on the patch center.
      centers: [B, G, C] the FPS-sampled center points.

    Reference: `pointcloud/utils.py:6-38`. NOTE the reference's normalization
    (`utils.py:36`) indexes `neighbors[:, :, :3]`, which on its 4-D tensor
    slices the *group_size* axis — subtracting centers (all channels) from the
    first three *neighbors*, contradicting its own comment ("normalize only
    point coordinates, which are first 3 dimensions"). Default behavior here
    implements the documented intent: subtract centers from the xyz *channels*
    of every neighbor. `compat=True` reproduces the reference's actual slice,
    because the released checkpoints were trained through it and their stem
    weights expect that input distribution.
    """
    # NOTE: a fused FPS+kNN kernel exists (ops/pallas/patchify.py) but
    # measured SLOWER than the separate kernels (23.2 vs 20.9 ms full
    # forward at [256,1024]): its [Bt, G, N] key block exceeds comfortable
    # VMEM residency, while the separate kNN kernel's per-row [G, N] blocks
    # stay local. Kept as a documented experiment.
    centers = fps(points, num_groups, key)
    idx = knn(group_size, points[..., :3], centers[..., :3])
    # FPS/kNN select on f32 coordinates; the neighbor gather may run in the
    # consumer's compute dtype (values identical to gather-then-cast, and
    # exact for the MXU kernel at DEFAULT precision — see ops/pallas/gather)
    src = points.astype(neighbor_dtype) if neighbor_dtype else points

    if not compat:
        from vipformer_tpu.ops.pallas.gather import (
            centered_gather_enabled,
            gather_rows_centered_pallas,
        )

        if centered_gather_enabled(src, num_groups, group_size):
            # fused gather+centering: the signed one-hot contraction emits
            # points[idx] - center_xyz directly, skipping the separate
            # broadcast+sub round trip over padded minor-dim-3 tiles
            # (2.5 ms of the r3 train step at [384, 128, 32, 3])
            b = src.shape[0]
            flat = gather_rows_centered_pallas(
                src, centers, idx.reshape(b, -1), group_size, 8,
                jax.default_backend() != "tpu",
            )
            return (
                flat.reshape(b, num_groups, group_size, src.shape[-1]),
                centers,
            )

    neighbors = index_points(src, idx)  # [B, G, S, C]
    c = centers.astype(neighbors.dtype)
    if compat:
        # reference slice: neighbors[:, :, :3] -= centers.unsqueeze(2)[:, :, :3]
        # — the :3 lands on the group_size axis, so the first three neighbor
        # slots get centers subtracted across ALL channels
        head = neighbors[:, :, :3, :] - c[:, :, None, :]
        neighbors = jnp.concatenate([head, neighbors[:, :, 3:, :]], axis=2)
    else:
        delta = neighbors[..., :3] - c[..., None, :3]
        neighbors = jnp.concatenate([delta, neighbors[..., 3:]], axis=-1)
    return neighbors, centers


def three_nn_interpolate(
    xyz_dst: Array, xyz_src: Array, feats_src: Array, eps: float = 1e-8
) -> Array:
    """Inverse-distance-weighted 3-NN feature interpolation.

    Upsamples per-group features back to per-point features (the dense decode
    step of both segmentation heads).

    Args:
      xyz_dst: [B, N, 3] target positions (all points).
      xyz_src: [B, S, 3] source positions (group centers).
      feats_src: [B, S, D] features at the sources.
    Returns:
      [B, N, D] interpolated features.

    Reference: `PointNetFeaturePropagation.forward`
    (`pointcloud/utils.py:203-230`) — there a full sort of the [B, N, S]
    distance matrix; here `top_k(3)` (S is small so either is cheap, but
    top_k avoids materializing a sorted matrix).
    """
    wmat = three_nn_weights(xyz_dst, xyz_src, eps)
    return jnp.einsum(
        "bns,bsd->bnd",
        wmat.astype(feats_src.dtype),
        feats_src,
        preferred_element_type=feats_src.dtype,
    )


def three_nn_weights(
    xyz_dst: Array, xyz_src: Array, eps: float = 1e-8
) -> Array:
    """Row-stochastic inverse-distance 3-NN weight matrix [B, N, S].

    The three per-point weights are scattered into a dense [B, N, S]
    matrix so interpolation is ONE batched MXU matmul
    (`wmat @ feats_src`). The gather-then-weight form (index_points ->
    [B, N, 3, D] -> weighted sum) materializes 3x the output in HBM and
    backpropagates into feats_src through a scatter; the dense form is
    well-shaped matmuls both directions (S = num_groups is small, so the
    S-wide product beats the gather traffic: 2*S flops/elem vs ~12
    bytes/elem at S=128). Exposed separately because the matrix form
    also lets callers hoist a following linear layer through the
    interpolation (`wmat @ x @ W == wmat @ (x @ W)` — see
    nn.pointnet.FeaturePropagation).
    """
    d = square_distance(xyz_dst, xyz_src)  # [B, N, S]
    # Three min+mask passes instead of lax.top_k: XLA lowers top_k on TPU
    # as a full variadic SORT of the [B, N, S] distances — 1.18 ms of the
    # r5 partseg train step (per-op profile, `sort f32[96,1024,128]`) for
    # what is a select-3. Each pass is one VPU reduce + compare fusion;
    # the one-hot of the current minimum (first occurrence on ties, like
    # top_k) both accumulates that neighbor's weight into the dense
    # [B, N, S] matrix and masks it for the next pass, so the separate
    # scatter-by-comparison the top_k form needed disappears too.
    s = xyz_src.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2)
    w_unnorm = jnp.zeros_like(d)
    w_sum = 0.0
    d_work = d
    for _ in range(3):
        i = jnp.argmin(d_work, axis=-1)  # [B, N]; first index on ties
        v = jnp.min(d_work, axis=-1, keepdims=True)
        onehot = (iota == i[..., None]).astype(d.dtype)
        w_k = 1.0 / (v + eps)
        w_unnorm = w_unnorm + onehot * w_k
        w_sum = w_sum + w_k
        d_work = jnp.where(onehot > 0, jnp.inf, d_work)
    return w_unnorm / w_sum
