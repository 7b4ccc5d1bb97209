"""Core NN building blocks (flax.linen).

One attention stack serves the whole framework — the reference duplicates
three near-identical copies (`core/modules.py:13-246`,
`pointcloud/partseg.py:15-213`, `pointcloud/semseg.py:13-211`); every
behavioral difference between them is a constructor argument here.

Faithful semantics preserved from the reference:
* pre-LN attention with separate q-norm / kv-norm for cross-attention
  (`core/modules.py:113-129`),
* decoupled qk / v / output projection widths (`core/modules.py:39-62`),
* post-softmax attention dropout (`core/modules.py:91-93`),
* residual = drop_path(dropout(f(x)) + x) — DropPath wraps the *sum*,
  skip included (`core/modules.py:266-270`); kept faithful since all
  published accuracies were trained with it,
* exact (erf) GELU, LayerNorm eps 1e-5, torch-default parameter inits.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vipformer_tpu.nn.init import torch_linear_bias, torch_linear_kernel
from vipformer_tpu.ops.attention import dot_product_attention

Array = jax.Array
Dtype = Any


def gelu_exact(x: Array) -> Array:
    """Exact GELU via the erf form 0.5*x*(1+erf(x/sqrt(2))), stats in f32.

    This is torch's formula (`torch.nn.GELU()` default, what the reference
    runs everywhere, e.g. `core/modules.py:253`).  jax.nn.gelu
    (approximate=False) instead computes 0.5*x*erfc(-x/sqrt(2)) — same
    function, but (a) XLA's erfc lowering on TPU costs ~3.4x a full MLP's
    matmuls (measured: MLP block 161 us erfc-form vs 80 us erf-form vs
    50 us activation-free at [16384,256->512->256] bf16), and (b) jax
    evaluates it at the input dtype, so bf16 activations get a bf16-
    precision erfc.  Upcasting to f32 here is both faster and closer to
    the reference's fp32/AMP numerics; |erf-form - erfc-form| <= 1.5e-6
    absolute in f32 over the whole real line.
    """
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jax.lax.erf(xf * 0.7071067811865476))
    return y.astype(x.dtype)


class Dense(nn.Module):
    """Linear layer with torch-default init (see nn/init.py)."""

    features: int
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x) -> Array:
        # A tuple input means "implicit channel concat": the params are
        # identical to Dense over the concatenation, but the forward runs
        # one dot per segment and sums (concat([a, b]) @ W == a @ W[:ca]
        # + b @ W[ca:]). Segments broadcast against each other, so a
        # [B,G,1,C] global feature paired with a [B,G,S,C] local one never
        # materializes the [B,G,S,2C] broadcast-concat — less HBM traffic,
        # and it sidesteps an XLA TPU fusion check-fail (TransformWindow
        # "Loop will not make progress") that the fused broadcast+concat+
        # reduce graph trips at degenerate patch shapes (G=16, S=8 eval).
        # A segment may also be an (array, post_fn) pair: post_fn is
        # applied to that segment's product before the sum, which hoists
        # this Dense through a LINEAR operator the caller would otherwise
        # apply to the segment first (L(x) @ W == L(x @ W)) — e.g. the
        # seg decode's 3-NN interpolation runs the widest matmul of the
        # model on S group rows instead of N point rows.
        raw = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        segments, posts = [], []
        for s in raw:
            if isinstance(s, tuple):
                segments.append(s[0])
                posts.append(s[1])
            else:
                segments.append(s)
                posts.append(None)
        segments = tuple(segments)
        fan_in = sum(s.shape[-1] for s in segments)
        kernel = self.param(
            "kernel", torch_linear_kernel(), (fan_in, self.features)
        )
        bias = (
            self.param("bias", torch_linear_bias(fan_in), (self.features,))
            if self.use_bias
            else None
        )
        promoted = nn.dtypes.promote_dtype(
            *segments, kernel, bias, dtype=self.dtype
        )
        segments, kernel, bias = promoted[:-2], promoted[-2], promoted[-1]

        from vipformer_tpu.ops.pallas import shard
        from vipformer_tpu.ops.pallas.dense import (
            dense_apply,
            dense_grad_enabled,
            effective_tp_role,
        )

        if len(segments) > 1 or posts[0] is not None:
            # Each segment's product is its own matmul, so each routes its
            # (dW-slice, db) through the Pallas row-stream backward when
            # its OWN row count qualifies — the seg-decode sites
            # ([B*N ~= 98k, 1024] skip features into SegHead/
            # FeaturePropagation) otherwise pay XLA's tall-skinny dW
            # emitter, the same pathology dense_apply was built for
            # (r4 VERDICT item 4).  The bias rides the post-free segment
            # with the most rows (adding it to any single summand is the
            # same math — the sum broadcasts it across the rest — and on
            # the widest segment its cotangent is the least-reduced dy,
            # so the kernel's fused db subsumes the biggest XLA column
            # reduce); broadcast-only segments (e.g. the [B,1,Dg] global
            # feature) keep the plain einsum.
            def _rows(s):
                r = 1
                for d in s.shape[:-1]:
                    r *= d
                return r

            free = [i for i, p in enumerate(posts) if p is None]
            bias_seg = (
                max(free, key=lambda i: _rows(segments[i])) if free else None
            )
            y = None
            off = 0
            for i, (s, post) in enumerate(zip(segments, posts)):
                w_seg = kernel[off : off + s.shape[-1]]
                rows = _rows(s)
                b_seg = bias if (bias is not None and i == bias_seg) else None
                if dense_grad_enabled(
                    rows, s.shape[-1], self.features, s.dtype.itemsize, None
                ):
                    part = dense_apply(s, w_seg, b_seg, None)
                else:
                    part = jnp.einsum(
                        "...i,ij->...j", s, w_seg,
                        preferred_element_type=s.dtype,
                    )
                    if b_seg is not None:
                        part = part + b_seg
                if post is not None:
                    part = post(part)
                y = part if y is None else y + part
                off += s.shape[-1]
            if bias is not None and bias_seg is None:
                y = y + bias
            return y
        x = segments[0]

        tp_role = None
        if shard.model_size() > 1:
            # under a TP mesh, learn this Dense's Megatron placement from
            # the same path rules that sharded its kernel, so the Pallas
            # backward reduces over the right axes (ops/pallas/dense.py)
            from vipformer_tpu.parallel.sharding import tp_role_for_path

            tp_role = effective_tp_role(
                tp_role_for_path("/".join(self.path) + "/kernel"),
                fan_in,
                self.features,
            )

        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        if dense_grad_enabled(
            rows, fan_in, self.features, x.dtype.itemsize, tp_role
        ):
            # same N-D forward einsum; backward routes (dW, db) through the
            # fused Pallas row-stream kernel (XLA's tall-skinny dW emitter
            # runs at 2-5% MFU at these shapes — see ops/pallas/dense.py)
            return dense_apply(x, kernel, bias, tp_role)

        # preferred_element_type = the compute dtype, NOT f32-then-astype:
        # the MXU accumulates f32 internally and rounds on emit either way
        # (K <= 1k is a single pass), but with f32-then-convert XLA
        # materializes the f32 product (r3 HLO: 100 MB f32 conv outputs per
        # MLP Dense at [384,128,512]) instead of folding the convert into
        # the conv emit
        y = jnp.einsum(
            "...i,ij->...j", x, kernel,
            preferred_element_type=x.dtype,
        )
        if bias is not None:
            y = y + bias
        return y


def _apply_dense_params(x, kernel, bias, dtype, tp_role=None):
    """nn.layers.Dense's exact math on explicit params (used by the
    kv-fused CrossAttention fast paths, which bypass the Dense modules
    post-init): promote to the compute dtype, one f32-accumulated matmul
    emitted at that dtype, bias added after the cast; backward routes
    (dW, db) through the Pallas row-stream kernel when the shape
    qualifies, exactly like the module. `tp_role` is the bypassed
    module's Megatron placement ('col' for q_proj, 'row' for o_proj) —
    the caller knows it statically because it is holding that module's
    params by name."""
    from vipformer_tpu.ops.pallas.dense import (
        dense_apply,
        dense_grad_enabled,
        effective_tp_role,
    )

    x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=dtype)
    tp_role = effective_tp_role(tp_role, kernel.shape[0], kernel.shape[1])
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    if dense_grad_enabled(
        rows, kernel.shape[0], kernel.shape[1], x.dtype.itemsize, tp_role
    ):
        return dense_apply(x, kernel, bias, tp_role)
    y = jnp.einsum("...i,ij->...j", x, kernel, preferred_element_type=x.dtype)
    if bias is not None:
        y = y + bias
    return y


class LayerNorm(nn.Module):
    """flax.linen.LayerNorm-equivalent (eps 1e-5, f32 fast-variance stats,
    param tree {scale, bias}) with an optional Pallas row-stream kernel.

    The inline path below is op-for-op the flax computation
    (flax normalization.py:138-141,:203-226) — bit-identical outputs and
    an identical checkpoint tree — and is what runs by default: XLA's LN
    handling measured faster than the kernel at every model site (see
    ops/pallas/layernorm.py).  The kernel remains forceable via
    layernorm.USE_LAYERNORM for shapes where XLA's reduce emitter
    misbehaves.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (d,), jnp.float32)
        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)

        from vipformer_tpu.ops.pallas.layernorm import (
            layernorm_apply,
            layernorm_enabled,
        )

        rows = 1
        for dim in x.shape[:-1]:
            rows *= dim
        if layernorm_enabled(rows, d, x.dtype.itemsize):
            return layernorm_apply(x, scale, bias).astype(out_dtype)

        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        mu2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        y = (xf - mu) * (jax.lax.rsqrt(var + 1e-5) * scale) + bias
        return y.astype(out_dtype)


def layer_norm(dtype=None, name=None):
    return LayerNorm(dtype=dtype, name=name)


class BatchNorm(nn.Module):
    """Train-mode BatchNorm with Pallas column-reduce kernels.

    flax.linen.BatchNorm's exact math (f32 stats, fast variance
    `max(0, E[x^2] - E[x]^2)`, f32 normalize, cast at the end, flax
    running-stat update) and an identical param/stat tree — the class is
    literally named `BatchNorm` so flax auto-naming produces the same
    "BatchNorm_N" paths whichever module a call site gets.  When the
    row count qualifies, the four pathological column reduces (fwd
    mean/E[x^2], bwd dscale/dbias over [B*N, C] activations — ~7 ms of
    the partseg train step, see ops/pallas/batchnorm.py) route through
    row-stream Pallas kernels via `bn_train_apply`'s custom VJP; under a
    mesh the kernels psum per-shard partials, preserving the sync-BN
    semantics the pjit path gets from XLA's automatic collectives.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        scale = self.param(
            "scale", nn.initializers.ones_init(), (c,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (c,), jnp.float32
        )

        from vipformer_tpu.ops.pallas.batchnorm import (
            bn_train_apply,
            bn_train_enabled,
        )

        rows = 1
        for d in x.shape[:-1]:
            rows *= d
        out_dtype = nn.dtypes.canonicalize_dtype(
            x, scale, bias, dtype=self.dtype
        )
        if not self.is_initializing() and bn_train_enabled(
            rows, c, x.dtype.itemsize
        ):
            y, mean, var = bn_train_apply(
                x, scale, bias, float(self.epsilon)
            )
            y = y.astype(out_dtype)
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            mu2 = jnp.mean(xf * xf, axes)
            var = jnp.maximum(0.0, mu2 - mean * mean)
            shape = (1,) * (x.ndim - 1) + (c,)
            mul = jax.lax.rsqrt(var + jnp.float32(self.epsilon)) * scale
            y = (
                (xf - mean.reshape(shape)) * mul.reshape(shape)
                + bias.reshape(shape)
            ).astype(out_dtype)
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * mean
            ra_var.value = m * ra_var.value + (1 - m) * var
        return y


def batch_norm(deterministic: bool, dtype=None, name=None, axis_name=None):
    """BatchNorm matching torch defaults (momentum 0.1 -> flax 0.9, eps 1e-5).

    Under pjit with a batch-sharded input, the batch mean/var reductions are
    global automatically (XLA inserts the collectives), so this behaves as
    sync-BN across the data axis — strictly better-behaved than the
    reference's per-replica DDP BatchNorm stats.

    flax.linen.BatchNorm everywhere by default; train-mode calls swap in
    the kernel-backed drop-in above only when its flag forces it on
    (same auto-name, same trees, forward bit-identical — pinned by
    tests/test_pallas.py::test_batchnorm_* — but the rebuilt backward
    graph reorders f32 ulps, which 50 Adam steps amplify past the
    trajectory-parity drift bounds, so the flax module stays the
    default while the kernel is a measured-negative experiment).
    """
    if not deterministic and axis_name is None:
        from vipformer_tpu.ops.pallas import batchnorm as pbn

        if pbn.USE_BN_TRAIN:
            return BatchNorm(
                momentum=0.9, epsilon=1e-5, dtype=dtype, name=name
            )
    return nn.BatchNorm(
        use_running_average=deterministic,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        name=name,
        axis_name=axis_name,
    )


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class MLP(nn.Module):
    """LN -> Dense(widen*D) -> GELU(exact) -> Dense(D).

    Reference `core/modules.py:249-256`.
    """

    widening_factor: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        d = x.shape[-1]
        x = layer_norm(self.dtype)(x)
        x = Dense(self.widening_factor * d, dtype=self.dtype)(x)
        x = gelu_exact(x)
        return Dense(d, dtype=self.dtype)(x)


class MultiHeadAttention(nn.Module):
    """Perceiver-style MHA with decoupled qk/v/output widths.

    Reference `core/modules.py:13-98`; the mp-family variant
    (`pointcloud/partseg.py:15-86`) is the special case
    qk = v = out = num_latent_channels.
    """

    num_heads: int
    num_qk_channels: Optional[int] = None
    num_v_channels: Optional[int] = None
    num_output_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x_q: Array,
        x_kv: Array,
        pad_mask: Optional[Array] = None,
        deterministic: bool = True,
    ) -> Array:
        qk_ch = self.num_qk_channels or x_q.shape[-1]
        v_ch = self.num_v_channels or qk_ch
        out_ch = self.num_output_channels or x_q.shape[-1]
        if qk_ch % self.num_heads or v_ch % self.num_heads:
            raise ValueError("qk/v channels must be divisible by num_heads")
        h = self.num_heads
        scale = (qk_ch // h) ** -0.5

        from vipformer_tpu.ops.pallas.attention import (
            fused_attention_packed,
            fused_attention_packed_kv,
            packed_attention_enabled,
            packed_attention_kv_enabled,
        )

        if not self.is_initializing() and packed_attention_kv_enabled(
            h, qk_ch, v_ch, x_kv.shape[1], x_kv.shape[-1], pad_mask,
            self.dropout, deterministic,
        ):
            # eval fast path: k/v projected inside the attention kernel,
            # chunk by chunk in VMEM — the [B, M, H*dh] k/v tensors (and
            # XLA's batch-degraded LN+proj megafusions, see
            # ops/pallas/attention.py) never exist in HBM. Same k_proj/
            # v_proj weights a checkpoint restores; init still runs the
            # Dense modules below so the param tree is unchanged.
            q = Dense(
                qk_ch, use_bias=False, dtype=self.dtype, name="q_proj"
            )(x_q)
            wk = self.get_variable("params", "k_proj")["kernel"]
            wv = self.get_variable("params", "v_proj")["kernel"]
            xk, wk, wv = nn.dtypes.promote_dtype(
                x_kv, wk, wv, dtype=self.dtype
            )
            # on a multi-device mesh: batch over data, whole heads + wk/wv
            # columns over model (ops/pallas/shard.py)
            from vipformer_tpu.ops.pallas.shard import (
                kv_attention_sharded_call,
            )

            o = kv_attention_sharded_call(
                lambda qq, xx, wkk, wvv, hh: fused_attention_packed_kv(
                    qq, xx, wkk, wvv, num_heads=hh, scale=scale,
                    interpret=jax.default_backend() != "tpu",
                ),
                q, xk, (), wk, wv, num_heads=h,
            )
            return Dense(out_ch, dtype=self.dtype, name="o_proj")(o)

        q = Dense(qk_ch, use_bias=False, dtype=self.dtype, name="q_proj")(x_q)
        k = Dense(qk_ch, use_bias=False, dtype=self.dtype, name="k_proj")(x_kv)
        v = Dense(v_ch, use_bias=False, dtype=self.dtype, name="v_proj")(x_kv)
        from vipformer_tpu.ops.pallas.flash_train import (
            flash_attention_train,
            flash_train_enabled,
        )

        if flash_train_enabled(
            h, qk_ch, v_ch, x_q.shape[1], x_kv.shape[1], pad_mask,
            deterministic,
        ) and (self.dropout == 0.0 or self.has_rng("dropout")):
            # training path: flash fwd+bwd with in-kernel dropout — the
            # [B, H, G, M] scores, the dropout rng array, and the keep mask
            # never exist in HBM (fwd keeps only the logsumexp residual,
            # bwd regenerates the mask from the scalar seed)
            if self.dropout > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            o = flash_attention_train(
                q, k, v, seed, h, scale, float(self.dropout),
                None, jax.default_backend() != "tpu",  # interpret on CPU
            )
            return Dense(out_ch, dtype=self.dtype, name="o_proj")(o)

        if packed_attention_enabled(
            h, qk_ch, v_ch, x_kv.shape[1], pad_mask, self.dropout,
            deterministic,
        ):
            # heads split inside the kernel: q/k/v stay in the projections'
            # [B, N, H*C] layout, so no relayout copies materialize in front
            # of the pallas call (measured 2 x 0.64 ms at flagship shapes,
            # which ate the head-split kernel's entire win). On a
            # multi-device mesh the kernel runs under shard_map — batch
            # over data, whole heads over model (ops/pallas/shard.py)
            from vipformer_tpu.ops.pallas.shard import attention_sharded_call

            o = attention_sharded_call(
                lambda a, b, c, hh: fused_attention_packed(
                    a, b, c, num_heads=hh, scale=scale,
                    interpret=jax.default_backend() != "tpu",
                ),
                q, k, v, num_heads=h,
            )
            return Dense(out_ch, dtype=self.dtype, name="o_proj")(o)

        from vipformer_tpu.ops.pallas.attention import (
            fused_attention_packed_small,
            packed_small_attention_enabled,
        )

        if packed_small_attention_enabled(
            h, qk_ch, v_ch, x_q.shape[1], x_kv.shape[1], pad_mask,
            self.dropout, deterministic,
        ):
            # small-M eval self-attention: batch-blocked so the launch isn't
            # per-row, scores stay in VMEM (the XLA path's [B, H, G, M] f32
            # scores are what made eval throughput non-monotone in batch)
            from vipformer_tpu.ops.pallas.shard import attention_sharded_call

            o = attention_sharded_call(
                lambda a, b, c, hh: fused_attention_packed_small(
                    a, b, c, num_heads=hh, scale=scale,
                    interpret=jax.default_backend() != "tpu",
                ),
                q, k, v, num_heads=h,
            )
            return Dense(out_ch, dtype=self.dtype, name="o_proj")(o)

        def split(x):  # [B, N, H*C] -> [B, H, N, C]
            b, n, _ = x.shape
            return x.reshape(b, n, h, -1).transpose(0, 2, 1, 3)

        rng = (
            self.make_rng("dropout")
            if (self.dropout > 0.0 and not deterministic)
            else None
        )
        o = dot_product_attention(
            split(q),
            split(k),
            split(v),
            scale=scale,
            pad_mask=pad_mask,
            dropout_rate=self.dropout,
            dropout_rng=rng,
            deterministic=deterministic,
        )
        b, _, n, _ = o.shape
        o = o.transpose(0, 2, 1, 3).reshape(b, n, v_ch)
        return Dense(out_ch, dtype=self.dtype, name="o_proj")(o)


class CrossAttention(nn.Module):
    """Pre-LN cross-attention (separate q / kv norms).

    Reference `core/modules.py:101-129`.
    """

    num_heads: int
    num_qk_channels: Optional[int] = None
    num_v_channels: Optional[int] = None
    num_output_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_q, x_kv, pad_mask=None, deterministic=True):
        from vipformer_tpu.ops.pallas.attention import (
            fused_attention_packed_kv_ln,
            packed_attention_kv_enabled,
        )

        qk_ch = self.num_qk_channels or x_q.shape[-1]
        v_ch = self.num_v_channels or qk_ch
        out_ch = self.num_output_channels or x_q.shape[-1]

        from vipformer_tpu.ops.pallas.flash_train import (
            flash_attention_train_kv,
            flash_train_kv_enabled,
        )

        if (
            not self.is_initializing()
            and flash_train_kv_enabled(
                self.num_heads, qk_ch, v_ch, x_q.shape[1], x_kv.shape[1],
                x_kv.shape[-1], pad_mask, deterministic,
            )
            and (self.dropout == 0.0 or self.has_rng("dropout"))
        ):
            # training fast path: kv LayerNorm + k/v projections folded
            # into the flash fwd+bwd kernel. The backward emits ONE bf16
            # dx array instead of two f32 [B, M, D] dk/dv arrays and
            # accumulates dWk/dWv/dLN in VMEM across the grid (1.6 GB of
            # HBM traffic gone at pretrain dims — ops/pallas/flash_train).
            # Same params the module path creates at init.
            x_qn = layer_norm(self.dtype, name="q_norm")(x_q)
            ap = self.get_variable("params", "attention")
            kvn = self.get_variable("params", "kv_norm")
            scale = (qk_ch // self.num_heads) ** -0.5
            q = _apply_dense_params(
                x_qn, ap["q_proj"]["kernel"], None, self.dtype, "col"
            )
            xk, wk, wv = nn.dtypes.promote_dtype(
                x_kv, ap["k_proj"]["kernel"], ap["v_proj"]["kernel"],
                dtype=self.dtype,
            )
            if self.dropout > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32,
                )
            else:
                seed = jnp.zeros((1,), jnp.int32)
            o = flash_attention_train_kv(
                q, xk, kvn["scale"], kvn["bias"], wk, wv, seed,
                self.num_heads, scale, float(self.dropout),
                None, jax.default_backend() != "tpu",
            )
            return _apply_dense_params(
                o, ap["o_proj"]["kernel"], ap["o_proj"]["bias"], self.dtype,
                "row",
            )

        if not self.is_initializing() and packed_attention_kv_enabled(
            self.num_heads, qk_ch, v_ch, x_kv.shape[1], x_kv.shape[-1],
            pad_mask, self.dropout, deterministic,
        ):
            # eval fast path: kv LayerNorm AND k/v projections run inside
            # the flash kernel, chunk by chunk in VMEM — neither the
            # normalized [B, M, D] tokens nor the k/v tensors exist in
            # HBM (ops/pallas/attention.py — XLA's LN+proj megafusions
            # degrade 1.8x per cloud at B=256). Same params the module
            # path creates at init; q/o projections replicate
            # nn.layers.Dense numerics exactly.
            x_qn = layer_norm(self.dtype, name="q_norm")(x_q)
            ap = self.get_variable("params", "attention")
            kvn = self.get_variable("params", "kv_norm")
            scale = (qk_ch // self.num_heads) ** -0.5
            q = _apply_dense_params(
                x_qn, ap["q_proj"]["kernel"], None, self.dtype, "col"
            )
            xk, wk, wv = nn.dtypes.promote_dtype(
                x_kv, ap["k_proj"]["kernel"], ap["v_proj"]["kernel"],
                dtype=self.dtype,
            )
            from vipformer_tpu.ops.pallas.shard import (
                kv_attention_sharded_call,
            )

            o = kv_attention_sharded_call(
                lambda qq, xx, s1, b1, wkk, wvv, hh: (
                    fused_attention_packed_kv_ln(
                        qq, xx, s1, b1, wkk, wvv,
                        num_heads=hh, scale=scale,
                        interpret=jax.default_backend() != "tpu",
                    )
                ),
                q, xk, (kvn["scale"], kvn["bias"]), wk, wv,
                num_heads=self.num_heads,
            )
            return _apply_dense_params(
                o, ap["o_proj"]["kernel"], ap["o_proj"]["bias"], self.dtype,
                "row",
            )

        x_q = layer_norm(self.dtype, name="q_norm")(x_q)
        x_kv = layer_norm(self.dtype, name="kv_norm")(x_kv)
        return MultiHeadAttention(
            num_heads=self.num_heads,
            num_qk_channels=self.num_qk_channels,
            num_v_channels=self.num_v_channels,
            num_output_channels=self.num_output_channels,
            dropout=self.dropout,
            dtype=self.dtype,
            name="attention",
        )(x_q, x_kv, pad_mask, deterministic)


class SelfAttention(nn.Module):
    """Pre-LN self-attention. Reference `core/modules.py:132-156`."""

    num_heads: int
    num_qk_channels: Optional[int] = None
    num_v_channels: Optional[int] = None
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic=True):
        from vipformer_tpu.ops.pallas.attention import (
            fused_attention_packed_small_qkv_ln,
            packed_small_qkv_ln_enabled,
        )

        qk_ch = self.num_qk_channels or x.shape[-1]
        v_ch = self.num_v_channels or qk_ch
        if (
            not self.is_initializing()
            and qk_ch == v_ch
            and packed_small_qkv_ln_enabled(
                self.num_heads, qk_ch, v_ch, x.shape[0], x.shape[1],
                x.shape[-1], pad_mask, self.dropout, deterministic,
            )
        ):
            # eval fast path (same pattern as CrossAttention's kv-fused
            # branch): pre-LN + q/k/v projections + small-M attention in
            # one VMEM kernel; the normalized tokens and q/k/v tensors
            # never exist in HBM (ops/pallas/attention.py
            # fused_attention_packed_small_qkv_ln). Same params the
            # module path creates at init; o_proj replicates
            # nn.layers.Dense numerics exactly.
            norm = self.get_variable("params", "norm")
            ap = self.get_variable("params", "attention")
            xk, wq, wk, wv = nn.dtypes.promote_dtype(
                x,
                ap["q_proj"]["kernel"],
                ap["k_proj"]["kernel"],
                ap["v_proj"]["kernel"],
                dtype=self.dtype,
            )
            o = fused_attention_packed_small_qkv_ln(
                xk, norm["scale"], norm["bias"], wq, wk, wv,
                num_heads=self.num_heads,
                scale=(qk_ch // self.num_heads) ** -0.5,
                interpret=jax.default_backend() != "tpu",
            )
            return _apply_dense_params(
                o, ap["o_proj"]["kernel"], ap["o_proj"]["bias"],
                self.dtype, "row",
            )

        xn = layer_norm(self.dtype, name="norm")(x)
        return MultiHeadAttention(
            num_heads=self.num_heads,
            num_qk_channels=self.num_qk_channels,
            num_v_channels=self.num_v_channels,
            dropout=self.dropout,
            dtype=self.dtype,
            name="attention",
        )(xn, xn, pad_mask, deterministic)


class CrossAttentionLayer(nn.Module):
    """Residual(cross-attn) + Residual(MLP).

    Reference `core/modules.py:159-184` (DropPath fixed to 0 in CA layers
    there and in the mp encoder, kept as a parameter here).
    """

    num_heads: int
    num_qk_channels: Optional[int] = None
    num_v_channels: Optional[int] = None
    num_output_channels: Optional[int] = None
    widening_factor: int = 1
    atten_drop: float = 0.0
    mlp_drop: float = 0.0
    drop_path_rate: float = 0.0
    attention_residual: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_q, x_kv, pad_mask=None, deterministic=True):
        att = CrossAttention(
            num_heads=self.num_heads,
            num_qk_channels=self.num_qk_channels,
            num_v_channels=self.num_v_channels,
            num_output_channels=self.num_output_channels,
            dropout=self.atten_drop,
            dtype=self.dtype,
        )(x_q, x_kv, pad_mask, deterministic)
        if self.attention_residual:
            att = nn.Dropout(self.atten_drop)(att, deterministic=deterministic)
            x = DropPath(self.drop_path_rate)(att + x_q, deterministic)
        else:
            x = att
        y = MLP(self.widening_factor, dtype=self.dtype)(x, deterministic)
        y = nn.Dropout(self.mlp_drop)(y, deterministic=deterministic)
        return DropPath(self.drop_path_rate)(y + x, deterministic)


class SelfAttentionLayer(nn.Module):
    """Residual(self-attn) + Residual(MLP).

    `post_attn_drop` is the residual dropout applied to the attention output:
    the generic family uses `atten_drop` (`core/modules.py:209`), the
    mp-family uses `mlp_drop` (`pointcloud/partseg.py:186`). Defaults to
    `atten_drop` when None.
    """

    num_heads: int
    num_qk_channels: Optional[int] = None
    num_v_channels: Optional[int] = None
    widening_factor: int = 1
    drop_path_rate: float = 0.0
    atten_drop: float = 0.0
    mlp_drop: float = 0.0
    post_attn_drop: Optional[float] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic=True):
        post = (
            self.post_attn_drop
            if self.post_attn_drop is not None
            else self.atten_drop
        )
        att = SelfAttention(
            num_heads=self.num_heads,
            num_qk_channels=self.num_qk_channels,
            num_v_channels=self.num_v_channels,
            dropout=self.atten_drop,
            dtype=self.dtype,
        )(x, pad_mask, deterministic)
        att = nn.Dropout(post)(att, deterministic=deterministic)
        x = DropPath(self.drop_path_rate)(att + x, deterministic)
        y = MLP(self.widening_factor, dtype=self.dtype)(x, deterministic)
        y = nn.Dropout(self.mlp_drop)(y, deterministic=deterministic)
        return DropPath(self.drop_path_rate)(y + x, deterministic)


def dpr_schedule(max_dpr: float, num_layers: int) -> list[float]:
    """Per-layer linspace DropPath schedule 0 -> max_dpr
    (reference `core/modules.py:228`, `pointcloud/partseg.py:375`)."""
    if num_layers == 1:
        return [0.0]
    return [max_dpr * i / (num_layers - 1) for i in range(num_layers)]


class SelfAttentionBlock(nn.Module):
    """Stack of SelfAttentionLayers with a linspace DropPath schedule.

    Reference `core/modules.py:214-246`. `remat=True` wraps each layer in
    jax.checkpoint (the reference's fairscale checkpoint_wrapper equivalent).
    """

    num_layers: int
    num_heads: int
    num_qk_channels: Optional[int] = None
    num_v_channels: Optional[int] = None
    widening_factor: int = 1
    max_dpr: float = 0.0
    atten_drop: float = 0.0
    mlp_drop: float = 0.0
    post_attn_drop: Optional[float] = None
    remat: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, pad_mask=None, deterministic=True):
        dprs = dpr_schedule(self.max_dpr, self.num_layers)
        layer_cls = (
            nn.remat(SelfAttentionLayer, static_argnums=(3,))
            if self.remat
            else SelfAttentionLayer
        )
        for i in range(self.num_layers):
            x = layer_cls(
                num_heads=self.num_heads,
                num_qk_channels=self.num_qk_channels,
                num_v_channels=self.num_v_channels,
                widening_factor=self.widening_factor,
                drop_path_rate=dprs[i],
                atten_drop=self.atten_drop,
                mlp_drop=self.mlp_drop,
                post_attn_drop=self.post_attn_drop,
                dtype=self.dtype,
            )(x, pad_mask, deterministic)
        return x
