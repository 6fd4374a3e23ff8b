"""Swin Transformer backbone (GRIT flavor), TPU-first.

Math parity: reference models/common/swin_model.py.

GRIT's Swin variant differs from stock Swin: EVERY stage has a PatchMerging
downsample, including the last (swin_model.py:600), whose merge projects to
``pos_dim`` (=1024) instead of doubling (``expand=False``, :315), yielding an
extra H/64 grid.  The backbone returns four maps: stage-2/3/4 outputs
(channels 256/512/1024) plus the extra H/64 x W/64 map (channels 1024)
(:659-671).  ``swin_base_win7_384``: embed 128, depths [2,2,18,2], heads
[4,8,16,32], window 12 (:690-699).

TPU design notes:
- channels-last [B, H*W, C] token layout with static (H, W) carried as Python
  ints — all reshapes/rolls are static so XLA compiles one fused program;
- cyclic shift is ``jnp.roll`` (a cheap HBM-local rotate under XLA);
- the shifted-window mask and relative-position index are numpy constants
  baked at trace time (grit_tpu.ops.window);
- no image-padding mask inside window attention, matching the reference
  (padded pixels participate; masking happens downstream);
- GELU is exact (erf) to match torch's default nn.GELU.
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from grit_tpu.models.attention import LN_EPS
from grit_tpu.ops.window import (
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth: drop the residual branch per sample (timm semantics).

    Dtype-preserving: a non-weak ``rate`` (e.g. a numpy float64 out of
    np.linspace) would otherwise promote bf16 activations to f32 — which
    silently doubled the resident-map kernels' VMEM footprint in training
    (stage-4 attention backward OOM'd the 16 MB scoped limit).
    """
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - float(rate)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    hidden: int
    out: int
    drop: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic=True):
        x = nn.Dense(self.hidden, name="fc1", dtype=self.dtype)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(self.out, name="fc2", dtype=self.dtype)(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class _DenseParams(nn.Module):
    """Parameter container with nn.Dense-compatible naming/init — lets a
    kernel path consume the same checkpoint leaves the Dense path creates."""

    features: int
    in_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features),
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


# Training-path A/B flag: run the gradient path's attention half-block
# through fused_block_step (LN1 + pad masking + attention in ONE kernel,
# branch-only output for drop-path) instead of an XLA LayerNorm followed by
# the whole-block kernel.  Kills the standalone LN's f32 convert/reduce
# passes per block.  Off pending a chip A/B (tools/bench_train.py).
_TRAIN_STEP_KERNEL = os.environ.get("GRIT_TRAIN_STEP_KERNEL", "0") == "1"
# PatchMerging LN(4C) + reduction matmul in one VMEM pass (the stage-exit
# convert_reduce/copy chains, ~6-10 ms at b128 eval).  Off pending chip A/B.
_FUSED_MERGE = os.environ.get("GRIT_FUSED_MERGE", "0") == "1"

# GRIT_PATCH_S2D: evaluate the non-overlapping patch-embed conv as
# space-to-depth + one [rows, kh*kw*cin] x [kh*kw*cin, C] matmul.  The conv
# has C_in=3, so XLA's conv-as-matmul lowering runs the MXU at a ~3/128
# contraction-dim utilization (11.7 ms of the b128 eval trace for 24 GFLOP
# of work); flattening the 4x4 patch into the contraction dim raises it to
# 48/128.  Same weights (kernel reshaped at use), same math up to f32
# summation order.
_PATCH_S2D = os.environ.get("GRIT_PATCH_S2D", "1") == "1"


class _LayerNormParams(nn.Module):
    """LayerNorm-compatible param container for kernel paths."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _MlpParams(nn.Module):
    """Mlp-compatible (fc1/fc2) param container for kernel paths."""

    hidden: int
    dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.hidden, self.dim, name="fc1")()
        w2, b2 = _DenseParams(self.dim, self.hidden, name="fc2")()
        return w1, b1, w2, b2


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    fused: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, bias_mask=None, *, deterministic=True, n_windows=None,
                 x_map=None, resident=None, mlp_params=None):
        """x: [B*nW, N, C] with N = window²; bias_mask: [nW, N, N] additive or None.

        ``x_map`` selects the whole-block kernel path: pass the
        un-partitioned [B, Hp, Wp, C] map (padded + pre-rolled) and the qkv
        projection, window partition (via BlockSpec DMA), attention, output
        projection and window reverse all run in one Pallas kernel; returns
        [B, Hp, Wp, C].  Parameter names/shapes are identical to the
        standard path, so checkpoints are interchangeable.

        ``resident`` selects the fused block-STEP path on a resident padded
        map: pass ``(lns, lnb, real_hw, shift, residual, storage_shift)``
        together with ``x_map`` holding the RAW (pre-LN1) padded map, rolled
        by ``storage_shift`` (== shift in the classic pre-rolled contract,
        == the previous block's shift in roll-free mode); LN1,
        the pad-token zeroing, attention, output projection and the residual
        all run in one kernel (grit_tpu.ops.window_attention.fused_block_step).
        """
        h = self.num_heads
        if x_map is not None:
            n = self.window * self.window
            c = x_map.shape[-1]
        else:
            b_, n, c = x.shape
        d = c // h

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, h),
        )
        rel_idx = relative_position_index((self.window, self.window))  # [N, N]
        bias = table[rel_idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)

        if resident is not None:
            from grit_tpu.ops.window_attention import (
                fused_block_mlp_step,
                fused_block_step,
            )

            lns, lnb, real_hw, shift, residual, storage_shift = resident
            if bias_mask is not None:
                combined = (
                    bias[None].astype(jnp.float32)
                    + bias_mask[:, None].astype(jnp.float32)
                )
            else:
                combined = bias[None].astype(jnp.float32)
            wqkv, bqkv = _DenseParams(3 * c, c, name="qkv")()
            wproj, bproj = _DenseParams(c, c, name="proj")()
            if self.dtype is not None:
                wqkv, bqkv = wqkv.astype(self.dtype), bqkv.astype(self.dtype)
                wproj, bproj = wproj.astype(self.dtype), bproj.astype(self.dtype)
            if mlp_params is not None:
                # whole-block residency: MLP half-block fused into the same
                # program (caller checked block_mlp_fusable)
                out = fused_block_mlp_step(
                    x_map, lns, lnb, wqkv, bqkv, wproj, bproj, combined,
                    *mlp_params,
                    scale=d ** -0.5, num_heads=h, window=self.window,
                    real_hw=real_hw, shift=shift, eps=LN_EPS,
                    storage_shift=storage_shift,
                )
            else:
                out = fused_block_step(
                    x_map, lns, lnb, wqkv, bqkv, wproj, bproj, combined,
                    scale=d ** -0.5, num_heads=h, window=self.window,
                    real_hw=real_hw, shift=shift, residual=residual, eps=LN_EPS,
                    storage_shift=storage_shift,
                )
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        if x_map is not None:
            from grit_tpu.ops.window_attention import fused_block_attention

            if bias_mask is not None:
                combined = (
                    bias[None].astype(jnp.float32)
                    + bias_mask[:, None].astype(jnp.float32)
                )
            else:
                combined = bias[None].astype(jnp.float32)
            wqkv, bqkv = _DenseParams(3 * c, c, name="qkv")()
            wproj, bproj = _DenseParams(c, c, name="proj")()
            if self.dtype is not None:
                # match nn.Dense(dtype=...): params cast to the compute dtype
                # at call time (also halves the per-grid-step weight DMA)
                wqkv, bqkv = wqkv.astype(self.dtype), bqkv.astype(self.dtype)
                wproj, bproj = wproj.astype(self.dtype), bproj.astype(self.dtype)
            out = fused_block_attention(
                x_map, wqkv, bqkv, wproj, bproj, combined,
                scale=d ** -0.5, num_heads=h, window=self.window,
            )
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)

        qkv_flat = nn.Dense(3 * c, name="qkv", dtype=self.dtype)(x)  # [B*nW, N, 3C]

        # the kernel pair (fused fwd + fused flash-style bwd) covers training
        # too; attention dropout would need the probability matrix, so fall
        # back to the plain XLA formulation if it is ever enabled (GRIT runs
        # attn_drop=0, swin_model.py:697)
        use_fused = (
            self.fused and n_windows is not None
            and (deterministic or self.attn_drop == 0.0)
        )
        if use_fused:
            # scores + bias + shift-mask + softmax + AV fused in VMEM — never
            # materializes the [W, h, N, N] score tensor (the profiled
            # bottleneck of the unfused path); merged-head layout throughout
            from grit_tpu.ops.window_attention import fused_window_attention

            if bias_mask is not None:
                combined = (
                    bias[None].astype(jnp.float32)
                    + bias_mask[:, None].astype(jnp.float32)
                )  # [nW, h, N, N]
            else:
                combined = bias[None].astype(jnp.float32)  # [1, h, N, N]
            nb = b_ // n_windows

            def part(i):
                return qkv_flat[..., i * c:(i + 1) * c].reshape(nb, n_windows, n, c)

            out = fused_window_attention(
                part(0), part(1), part(2), combined, d ** -0.5, h
            ).reshape(b_, n, c)
            out = nn.Dense(c, name="proj", dtype=self.dtype)(out)
            return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        else:
            qkv = qkv_flat.reshape(b_, n, 3, h, d).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k)
            attn = attn + bias[None].astype(attn.dtype)
            if bias_mask is not None:
                nw = bias_mask.shape[0]
                attn = attn.reshape(b_ // nw, nw, h, n, n) + bias_mask[None, :, None].astype(attn.dtype)
                attn = attn.reshape(b_, h, n, n)
            attn = nn.softmax(attn, axis=-1)
            attn = nn.Dropout(self.attn_drop)(attn, deterministic=deterministic)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        out = nn.Dense(c, name="proj", dtype=self.dtype)(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int = 12
    shift: int = 0
    mlp_ratio: float = 4.0
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    fused_attn: bool = False
    # roll-free resident mode: the storage roll of the INCOMING map (the
    # previous block's shift); the block's output is stored rolled by its
    # own ``shift``.  Only meaningful when rollfree_enabled() and the map
    # is resident (BasicLayer sets it); ignored otherwise.
    storage_shift: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, hw: tuple[int, int], deterministic: bool = True):
        # The whole-block attention / fused-MLP kernels are differentiable
        # (custom_vjp with a flash-style recompute backward), so training
        # uses the same fused forward the eval path does.  The only thing
        # that cannot fuse is dropout INSIDE a kernel (attention-probability
        # dropout needs the score matrix; Mlp dropout the GELU output) — so
        # each fused path gates on its dropout being inert, not on eval.
        # GRIT runs attn_drop=0 and drop=0 (swin_model.py:697), so both
        # kernels are active during training; drop-path applies OUTSIDE.
        if x.ndim == 4:
            # resident padded-map fast path (BasicLayer pads once per stage):
            # LN1 + pad-token masking + attention + residual run in ONE
            # Pallas kernel (fused_block_step); the map stays padded (and,
            # for shifted blocks, rolled) through the MLP kernel, so a block
            # contributes zero XLA data-formatting ops between kernels.
            return self._resident_block(x, hw, deterministic)
        h, w = hw
        b, L, c = x.shape
        shortcut = x
        use_step_kernel = (
            _TRAIN_STEP_KERNEL and self.fused_attn
            and (deterministic or self.attn_drop == 0.0)
        )
        pad_b = (self.window - h % self.window) % self.window
        pad_r = (self.window - w % self.window) % self.window
        hp, wp = h + pad_b, w + pad_r

        attn = WindowAttention(
            self.dim, self.window, self.num_heads,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            fused=self.fused_attn, dtype=self.dtype, name="attn",
        )

        if use_step_kernel:
            # LN1 + pad masking + attention + proj in ONE kernel on the RAW
            # map (branch-only: drop-path and the residual apply outside, as
            # the reference orders them); same params/names as the split
            # path, so the two are checkpoint-interchangeable
            lns, lnb = _LayerNormParams(self.dim, name="norm1")()
            x4 = shortcut.reshape(b, h, w, c)
            if pad_b or pad_r:
                x4 = jnp.pad(x4, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
            if self.shift > 0:
                x4 = jnp.roll(x4, shift=(-self.shift, -self.shift), axis=(1, 2))
                mask = jnp.asarray(
                    shifted_window_mask(hp, wp, self.window, self.shift))
            else:
                mask = None
            x4 = attn(
                None, mask, deterministic=deterministic, x_map=x4,
                resident=(lns, lnb, (h, w), self.shift, False, self.shift),
            )
            if self.shift > 0:
                x4 = jnp.roll(x4, shift=(self.shift, self.shift), axis=(1, 2))
            if pad_b or pad_r:
                x4 = x4[:, :h, :w]
            x = x4.reshape(b, L, c)
        else:
            x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm1")(x)
            x = x.reshape(b, h, w, c)
            if pad_b or pad_r:
                x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

            if self.shift > 0:
                x = jnp.roll(x, shift=(-self.shift, -self.shift), axis=(1, 2))
                mask = jnp.asarray(
                    shifted_window_mask(hp, wp, self.window, self.shift))
            else:
                mask = None

            if self.fused_attn and (deterministic or self.attn_drop == 0.0):
                # whole-block kernel on the un-partitioned map — the
                # partition/reverse transposes become BlockSpec DMA
                x = attn(None, mask, deterministic=deterministic, x_map=x)
            else:
                windows = window_partition(x, self.window)
                attn_out = attn(
                    windows, mask, deterministic=deterministic,
                    n_windows=(hp // self.window) * (wp // self.window),
                )
                x = window_reverse(attn_out, self.window, hp, wp)

            if self.shift > 0:
                x = jnp.roll(x, shift=(self.shift, self.shift), axis=(1, 2))
            if pad_b or pad_r:
                x = x[:, :h, :w]
            x = x.reshape(b, L, c)

        rng = self.make_rng("dropout") if not deterministic and self.drop_path_rate > 0 else None
        x = shortcut + drop_path(x, self.drop_path_rate, deterministic, rng)
        hidden = int(self.dim * self.mlp_ratio)
        if self.fused_attn and (deterministic or self.drop == 0.0):
            # LN2 + fc1 + exact-GELU + fc2 [+ residual] in one VMEM-resident
            # kernel (the [rows, 4C] GELU intermediate never touches HBM).
            # With stochastic depth active the kernel returns just the
            # branch and drop-path + residual apply outside.
            from grit_tpu.ops.window_attention import fused_mlp

            lns, lnb = _LayerNormParams(self.dim, name="norm2")()
            w1, b1, w2, b2 = _MlpParams(hidden, self.dim, name="mlp")()
            if self.dtype is not None:
                w1, b1 = w1.astype(self.dtype), b1.astype(self.dtype)
                w2, b2 = w2.astype(self.dtype), b2.astype(self.dtype)
            branch_only = not deterministic and self.drop_path_rate > 0
            out = fused_mlp(x, lns, lnb, w1, b1, w2, b2, eps=LN_EPS,
                            residual=not branch_only)
            if branch_only:
                rng2 = self.make_rng("dropout")
                out = x + drop_path(out, self.drop_path_rate, deterministic, rng2)
            return out
        mlp_out = Mlp(
            hidden, self.dim, self.drop, dtype=self.dtype, name="mlp"
        )(nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm2")(x), deterministic=deterministic)
        rng2 = self.make_rng("dropout") if not deterministic and self.drop_path_rate > 0 else None
        return x + drop_path(mlp_out, self.drop_path_rate, deterministic, rng2)

    def _resident_block(self, x, hw: tuple[int, int], deterministic: bool):
        """x: [B, Hp, Wp, C] RAW resident padded map -> same (unrolled coords).

        Caller (BasicLayer) only selects this path when ``deterministic``
        (eval, or a frozen stage during training), so dropout and drop-path
        are inert and both residuals live inside the kernels.
        """
        from grit_tpu.ops import window_attention as wa
        from grit_tpu.ops.window_attention import fused_mlp

        assert deterministic, "resident mode is gated on deterministic"
        b, hp, wp, c = x.shape
        lns, lnb = _LayerNormParams(self.dim, name="norm1")()

        # roll-free mode: the band kernel absorbs the shift on its read side
        # (storage_shift = previous block's shift, set by BasicLayer); the
        # map then STAYS rolled by self.shift until the next block (the MLP
        # is per-token, storage order is irrelevant to it) and BasicLayer
        # unrolls once at stage exit.  Classic mode: roll/unroll around the
        # attention kernel here.
        rollfree = wa.rollfree_enabled()
        if self.shift > 0:
            if not rollfree:
                x = jnp.roll(x, shift=(-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(shifted_window_mask(hp, wp, self.window, self.shift))
        else:
            mask = None

        attn = WindowAttention(
            self.dim, self.window, self.num_heads,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            fused=True, dtype=self.dtype, name="attn",
        )

        hidden = int(self.dim * self.mlp_ratio)
        lns2, lnb2 = _LayerNormParams(self.dim, name="norm2")()
        w1, b1, w2, b2 = _MlpParams(hidden, self.dim, name="mlp")()
        if self.dtype is not None:
            w1, b1 = w1.astype(self.dtype), b1.astype(self.dtype)
            w2, b2 = w2.astype(self.dtype), b2.astype(self.dtype)

        # whole-block residency where the full block fits one program
        # (stages 1-2 at GRIT shapes): attention + MLP in one kernel
        n_bias_kinds = 1 if self.shift == 0 else (hp // self.window) * (
            wp // self.window)
        fuse_mlp = wa.block_mlp_fusable(
            c, self.num_heads, self.window, hp, wp, n_bias_kinds, hidden,
            x.dtype.itemsize,
        )
        resident_spec = (lns, lnb, hw, self.shift, True,
                         self.storage_shift if rollfree else self.shift)
        if fuse_mlp:
            x_out = attn(
                None, mask, deterministic=True, x_map=x,
                resident=resident_spec,
                mlp_params=(lns2, lnb2, w1, b1, w2, b2),
            )
        else:
            out = attn(None, mask, deterministic=True, x_map=x,
                       resident=resident_spec)
            rows = out.reshape(b, hp * wp, c)
            mlp_out = fused_mlp(rows, lns2, lnb2, w1, b1, w2, b2, eps=LN_EPS,
                                residual=True)
            x_out = mlp_out.reshape(b, hp, wp, c)
        x = x_out
        if self.shift > 0 and not rollfree:
            x = jnp.roll(x, shift=(self.shift, self.shift), axis=(1, 2))
        return x


class PatchMerging(nn.Module):
    """2x2 token merge: LN(4C) then Linear(4C -> 2C) — or -> pos_dim when last."""

    dim: int
    out_dim: int
    fused: bool = False  # LN+reduction in one kernel (set by BasicLayer)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, hw: tuple[int, int]):
        h, w = hw
        b, L, c = x.shape
        x = x.reshape(b, h, w, c)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, -1, 4 * c)
        if self.fused and _FUSED_MERGE:
            from grit_tpu.ops.window_attention import fused_ln_linear

            lns, lnb = _LayerNormParams(4 * c, name="norm")()
            w_red, _ = _DenseParams(
                self.out_dim, 4 * c, use_bias=False, name="reduction")()
            if self.dtype is not None:
                w_red = w_red.astype(self.dtype)
            return fused_ln_linear(x, lns, lnb, w_red, eps=LN_EPS)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.out_dim, use_bias=False, name="reduction", dtype=self.dtype)(x)


class BasicLayer(nn.Module):
    dim: int
    out_dim: int
    depth: int
    num_heads: int
    window: int = 12
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rates: Sequence[float] = ()
    use_checkpoint: bool = False
    fused_attn: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, hw: tuple[int, int], *, deterministic=True):
        h, w = hw
        block_cls = SwinBlock
        if self.use_checkpoint:
            # activation rematerialization (the reference's use_checkpoint,
            # swin_model.py:445-448): trade recompute for HBM during training.
            # hw and deterministic are static (self counts as 0).
            block_cls = nn.remat(SwinBlock, static_argnums=(2, 3))

        # resident padded-map mode: pad ONCE here and hand blocks the 4-D
        # map — each block is then LN1+attn+residual kernel -> MLP kernel
        # with no per-block pad/unpad/LN/residual XLA ops (and no layout
        # ping-pong) in between.  Eval-only (plus frozen stages, which run
        # deterministic during training): measured 212.2 -> 225.8 img/s at
        # b128 eval, but a 3% REGRESSION for the gradient path — the fused
        # MLP then runs fwd+bwd over the resident padding (stage 3 pads W
        # 40->48, +20% rows), which costs more than the saved formatting —
        # so training blocks keep the unpadded fused pair.  docs/NOTES.md.
        resident = self.fused_attn and deterministic
        if resident:
            b, L, c = x.shape
            pad_b = (self.window - h % self.window) % self.window
            pad_r = (self.window - w % self.window) % self.window
            x = x.reshape(b, h, w, c)
            if pad_b or pad_r:
                x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))

        # roll-free resident mode: the map's storage follows each block's
        # shift (the band kernel reads at the static offset), so the
        # per-shifted-block jnp.roll pairs collapse to ONE unroll at stage
        # exit.  ``storage`` tracks the roll the previous block left behind.
        from grit_tpu.ops import window_attention as _wa
        rollfree = resident and _wa.rollfree_enabled()
        storage = 0
        for i in range(self.depth):
            shift_i = 0 if i % 2 == 0 else self.window // 2
            x = block_cls(
                dim=self.dim,
                num_heads=self.num_heads,
                window=self.window,
                shift=shift_i,
                drop=self.drop,
                attn_drop=self.attn_drop,
                drop_path_rate=self.drop_path_rates[i] if self.drop_path_rates else 0.0,
                fused_attn=self.fused_attn,
                storage_shift=storage if rollfree else 0,
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, hw, deterministic)
            if rollfree:
                storage = shift_i

        if resident:
            if rollfree and storage:
                x = jnp.roll(x, shift=(storage, storage), axis=(1, 2))
            x = x[:, :h, :w].reshape(b, h * w, c)
        x_down = PatchMerging(
            self.dim, self.out_dim, fused=self.fused_attn, dtype=self.dtype,
            name="downsample",
        )(x, hw)
        return x, x_down, ((h + 1) // 2, (w + 1) // 2)


class SwinTransformer(nn.Module):
    """GRIT Swin backbone; returns 4 NHWC feature maps (strides 8/16/32/64)."""

    embed_dim: int = 128
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (4, 8, 16, 32)
    window: int = 12
    patch_size: int = 4
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.3
    pos_dim: int = 1024
    use_checkpoint: bool = False
    fused_attn: bool = False
    # Reference _freeze_stages (swin_model.py:622-637, coco_config.yaml:29):
    # fs >= 0 freezes patch embed; fs >= 2 freezes stages 0..fs-2 (GRIT's
    # loop is ``range(0, fs - 1)`` — one stage fewer than stock mmdet Swin)
    # and runs them in eval mode (dropout/drop-path off).  Here a
    # ``stop_gradient`` at each frozen boundary both blocks the gradients and
    # lets XLA skip the whole backward computation through those stages.
    frozen_stages: int = -1
    dtype: Any = None

    @property
    def num_channels(self) -> list[int]:
        feats = [int(self.embed_dim * 2 ** i) for i in range(len(self.depths))]
        return feats[1:] + [self.pos_dim]

    @nn.compact
    def __call__(self, images: jnp.ndarray, *, deterministic=True) -> list[jnp.ndarray]:
        """images: [B, H, W, 3] with H, W multiples of 64 -> list of 4 NHWC maps."""
        b, h, w, _ = images.shape
        # patch-embed bias: torch Conv2d default U(+-1/sqrt(fan_in)), NOT
        # zeros (the reference's init_weights re-initializes only Linear and
        # LayerNorm — swin_model.py:641-650 — so its patch embed keeps the
        # torch default).  This is load-bearing for from-scratch training: a
        # zero bias makes every fully-padded patch's embedding EXACTLY zero,
        # and LayerNorm of a zero-variance row amplifies gradients by
        # rsqrt(eps) ~= 316 at every LN it passes through — compounding to
        # the 2.8e15 first-step grad norm that no-op'd detector pre-training
        # under global clipping (round-2 vdet3; docs/NOTES.md round 3).
        fan_in = self.patch_size * self.patch_size * images.shape[-1]
        bound = float(fan_in) ** -0.5
        conv = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            bias_init=lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            name="patch_embed_proj", dtype=self.dtype,
        )
        ps, cin = self.patch_size, images.shape[-1]
        wh, ww = h // ps, w // ps
        if _PATCH_S2D and not self.is_initializing():
            # space-to-depth + matmul (see _PATCH_S2D above); params stay
            # conv-shaped ([kh, kw, cin, C]) for checkpoint parity — the
            # dummy call keeps them alive, XLA DCEs it
            conv(jnp.zeros((1, ps, ps, cin), images.dtype))
            p = conv.variables["params"]
            kern, bias = p["kernel"], p["bias"]
            xs = images.reshape(b, wh, ps, ww, ps, cin)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, wh * ww, ps * ps * cin)
            wmat = kern.reshape(ps * ps * cin, self.embed_dim)
            if self.dtype is not None:
                xs = xs.astype(self.dtype)
                wmat, bias = wmat.astype(self.dtype), bias.astype(self.dtype)
            x = xs @ wmat + bias
        else:
            x = conv(images).reshape(b, wh * ww, self.embed_dim)
        if self.fused_attn and _FUSED_MERGE:
            # one-pass LN kernel: no f32 copy of the whole map in HBM
            from grit_tpu.ops.window_attention import fused_layernorm

            lns, lnb = _LayerNormParams(
                self.embed_dim, name="patch_embed_norm")()
            x = fused_layernorm(x, lns, lnb, eps=LN_EPS)
        else:
            x = nn.LayerNorm(
                epsilon=LN_EPS, dtype=self.dtype, name="patch_embed_norm")(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)
        # pos_drop: eval mode when fs >= 2 (swin_model.py:631-632)
        x = nn.Dropout(self.drop_rate)(
            x, deterministic=deterministic or self.frozen_stages >= 2
        )

        total = sum(self.depths)
        # python floats (weak-typed): numpy scalars would promote bf16 -> f32
        dpr = [float(v) for v in np.linspace(0, self.drop_path_rate, total)]
        outs = []
        hw = (wh, ww)
        for stage in range(len(self.depths)):
            dim = int(self.embed_dim * 2 ** stage)
            last = stage == len(self.depths) - 1
            out_dim = self.pos_dim if last else 2 * dim
            start = sum(self.depths[:stage])
            stage_frozen = stage < self.frozen_stages - 1
            x_out, x, new_hw = BasicLayer(
                dim=dim,
                out_dim=out_dim,
                depth=self.depths[stage],
                num_heads=self.num_heads[stage],
                window=self.window,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path_rates=dpr[start:start + self.depths[stage]],
                use_checkpoint=self.use_checkpoint,
                fused_attn=self.fused_attn,
                dtype=self.dtype,
                name=f"layers_{stage}",
            )(x, hw, deterministic=deterministic or stage_frozen)
            if stage_frozen:
                # frozen stage incl. its PatchMerging (reference freezes the
                # whole self.layers[i] module) — backward stops here
                x_out = jax.lax.stop_gradient(x_out)
                x = jax.lax.stop_gradient(x)
            if stage > 0:
                outs.append(x_out.reshape(b, hw[0], hw[1], dim))
            hw = new_hw
        outs.append(x.reshape(b, hw[0], hw[1], self.pos_dim))
        return outs


def swin_base_win12_384(dtype=None, drop_path_rate: float = 0.3, **kw) -> SwinTransformer:
    """The backbone GRIT ships (misnamed win7 upstream — it is window 12;
    reference swin_base_win7_384, swin_model.py:690-699)."""
    return SwinTransformer(
        embed_dim=128,
        depths=(2, 2, 18, 2),
        num_heads=(4, 8, 16, 32),
        window=12,
        drop_path_rate=drop_path_rate,
        pos_dim=1024,
        dtype=dtype,
        **kw,
    )


# backbone registry mirroring the reference's size menu
# (models/detection/detector.py:105-123 — nano/tiny/small/base/large)
BACKBONES = {
    "swin_base_win7_384_22k": dict(
        embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
        window=12, drop_path_rate=0.3, pos_dim=1024,
    ),
    "swin_large_win7_384_22k": dict(
        embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
        window=12, drop_path_rate=0.3, pos_dim=1536,
    ),
    "swin_small": dict(
        embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
        window=7, drop_path_rate=0.3, pos_dim=768,
    ),
    "swin_tiny": dict(
        embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
        window=7, drop_path_rate=0.2, pos_dim=768,
    ),
    "swin_nano": dict(
        embed_dim=64, depths=(2, 2, 6, 2), num_heads=(2, 4, 8, 16),
        window=7, drop_path_rate=0.2, pos_dim=512,
    ),
    # tiny-dims instance for fast CPU end-to-end drives and tests
    "swin_test": dict(
        embed_dim=16, depths=(1, 1), num_heads=(2, 2),
        window=4, drop_path_rate=0.0, pos_dim=64,
    ),
}


def build_swin(name: str = "swin_base_win7_384_22k", dtype=None, **overrides):
    """Build a backbone by preset name.

    ``fused_attn=True`` selects the Pallas kernel pipeline
    (grit_tpu.ops.window_attention) and is auto-enabled on TPU by the model
    builders (models/detector.py).  The v2 block-diagonal head-packing
    design beats plain XLA on v5e (docs/NOTES.md perf ladder: the round-1
    per-window v1 kernel lost; v2 and the round-2 whole-block/fused-MLP
    kernels drove 147->173.5 img/s eval; the round-3 resident padded-map
    pipeline — fused_block_step, eval/frozen stages only — took it to
    225.8).  On CPU it stays off — interpret mode is test-only.
    """
    spec = dict(BACKBONES[name])
    spec.update(overrides)
    return SwinTransformer(dtype=dtype, **spec)
