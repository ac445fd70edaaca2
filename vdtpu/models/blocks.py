"""UNet data-layer blocks: 2-D ResBlock and 0-D FC blocks.

Numerical/structural parity with `/root/reference/lib/model_zoo/openaimodel.py`
(ResBlock :162-274, FCBlock :2084-2141, Linear_MultiDim :2275-2293,
FCBlock_MultiDim :2295-2332). TPU-first choices: NHWC layout for the 2-D
stream; the 0-D stream keeps its latent as a flat [B, C*S] feature vector
(channel-major, matching the torch [B,C,S,1] view) so every FC block is one
MXU matmul. Gradient checkpointing is applied at the UNet level with
``jax.checkpoint`` policies instead of the reference's per-block autograd
hack (diffusion_utils.py:84-129).
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax.numpy as jnp

from vdtpu.models.layers import (
    Dtype, FusedGNSiLU, GNParams, apply_add, conv3, dense, group_norm, silu)


class ResBlock2D(nn.Module):
    """GN-SiLU-conv3 -> +time-FiLM -> GN-SiLU-zeroconv3, learned skip. NHWC."""
    channels: int
    out_channels: int
    dtype: Dtype = jnp.float32
    dropout: float = 0.0

    def _gn_silu(self, x, name: str):
        """GN+SiLU; both branches share the {scale, bias} param path."""
        if os.environ.get("VDTPU_FUSED_GN"):
            return FusedGNSiLU(dtype=self.dtype, name=name)(x)
        return silu(group_norm(name)(x).astype(self.dtype))

    # NOTE: handing the GN+SiLU prologue to QConv as a fused Pallas
    # GN+SiLU+quantize pass (quant._act_with_prologue) measured NEGATIVE on
    # v5e TWICE — r2-early whole-slab (62 vs 38.6 ms/step) and r2-late with
    # the blocked stats+apply kernels at the batch-8 throughput point
    # (1.406 vs 1.557 img/s e2e) — the custom-call boundaries in the scan
    # body cost more in lost XLA fusions than the GN/quantize passes
    # themselves (34% of the step per the batch-16 trace, ~7x the HBM
    # floor, yet XLA's fused form still wins end to end). Opt-in stays via
    # VDTPU_QCONV_GN=1 (int8 policy only; identical param tree + numerics).

    def _gn_conv(self, x, gn_name: str, conv_name: str, add,
                 zero_init: bool = False):
        conv = conv3(self.out_channels, conv_name, self.dtype,
                     zero_init=zero_init)
        from vdtpu.ops.quant import QConv
        if os.environ.get("VDTPU_QCONV_GN", "0") in ("1", "stats") \
                and isinstance(conv, QConv):
            gs, gb = GNParams(x.shape[-1], name=gn_name)()
            return conv(x, gn=(gs, gb, True, 1e-5), add=add)
        h = self._gn_silu(x, gn_name)
        return apply_add(conv, h, add)

    def _fused_flat(self, x, e, whole: bool):
        """Fused-kernel ResBlock on the flat [B, H*W, C] layout (a FREE
        reshape of NHWC — ops/pallas/qconv.py). VDTPU_QCONV=fused runs each
        conv site as one GN+SiLU+quantize+int8-conv+adds kernel;
        VDTPU_QCONV=fused2 runs BOTH convs in a single kernel with the mid
        activation living only in VMEM. Calibration always takes the
        per-conv path (it sows the standard per-site act_absmax)."""
        import jax
        from vdtpu.ops.pallas.qconv import resblock_flat
        from vdtpu.ops.quant import get_policy
        b, hh, ww, cin = x.shape
        xf = x.reshape(b, hh * ww, cin)
        gs1, gb1 = GNParams(cin, name="in_layers.0")()
        conv1 = conv3(self.out_channels, "in_layers.2", self.dtype)
        if self.out_channels == self.channels:
            skip_f = None
        else:
            skip_f = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                             name="skip_connection")(
                xf[:, :, None, :])[:, :, 0, :]
        gs2, gb2 = GNParams(self.out_channels, name="out_layers.0")()
        conv2 = conv3(self.out_channels, "out_layers.3", self.dtype,
                      zero_init=True)
        if whole and get_policy() == "int8" and conv1.has_tables() \
                and conv2.has_tables():
            w1q, s1w, b1, sx1 = conv1.tables(cin)
            w2q, s2w, b2, sx2 = conv2.tables(self.out_channels)
            out = resblock_flat(
                xf, (gs1, gb1), w1q, s1w, b1, sx1, e, (gs2, gb2), w2q, s2w,
                b2, sx2, hh, ww, skip=skip_f,
                interpret=jax.default_backend() != "tpu")
        else:
            h = conv1(xf, gn=(gs1, gb1, True, 1e-5), add=e[:, None, :],
                      flat_hw=(hh, ww))
            out = conv2(h, gn=(gs2, gb2, True, 1e-5),
                        add=xf if skip_f is None else skip_f,
                        flat_hw=(hh, ww))
        return out.reshape(b, hh, ww, self.out_channels)

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        # FiLM and residual adds ride the convs' epilogues (apply_add):
        # separate add passes are HBM-bound (PERF.md r2)
        e = dense(self.out_channels, "emb_layers.1", self.dtype,
                  quant=False)(silu(emb.astype(self.dtype)))
        mode = os.environ.get("VDTPU_QCONV")
        if mode in ("fused", "fused2") and self.dropout == 0.0:
            from vdtpu.ops.pallas import qconv as _qc
            from vdtpu.ops.quant import get_policy
            if get_policy() in ("int8", "int8_calib") and _qc.eligible(
                    x.shape[1], x.shape[2], x.shape[-1], self.out_channels):
                return self._fused_flat(x, e, whole=mode == "fused2")
        h = self._gn_conv(x, "in_layers.0", "in_layers.2",
                          e[:, None, None, :])
        if self.out_channels == self.channels:
            skip = x
        else:
            skip = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                           name="skip_connection")(x)
        if self.dropout > 0.0:
            h = self._gn_silu(h, "out_layers.0")
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = conv3(self.out_channels, "out_layers.3", self.dtype,
                      zero_init=True)(h)
            return skip + h
        return self._gn_conv(h, "out_layers.0", "out_layers.3", skip,
                             zero_init=True)


class FCBlock(nn.Module):
    """The 0-D ResBlock: flat-feature MLP with time-FiLM and GroupNorm(32).

    Operates on [B, F] where F = prod(multidim shape); the torch version's
    1x1 convs over [B,F,1,1] are Dense layers here (same matrices).
    """
    channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        e = dense(self.out_channels, "emb_layers.1", self.dtype,
                  quant=False)(silu(emb.astype(self.dtype)))
        h = group_norm("in_layers.0")(x).astype(self.dtype)
        h = apply_add(dense(self.out_channels, "in_layers.2", self.dtype),
                      silu(h), e)
        if self.out_channels == self.channels:
            skip = x
        else:
            skip = dense(self.out_channels, "skip_connection", self.dtype)(x)
        h = group_norm("out_layers.0")(h).astype(self.dtype)
        return apply_add(dense(self.out_channels, "out_layers.3", self.dtype,
                               zero_init=True), silu(h), skip)
