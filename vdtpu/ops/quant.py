"""int8 weight+activation quantized matmul/conv serving path.

The v5e MXU has 2x int8 throughput vs bf16; the UNet step is conv-dominated
(PERF.md: ~43% of step time in conv fusions at ~68% MXU). This module
provides drop-in quantized Conv/Dense with the SAME param tree as
nn.Conv/nn.Dense (f32/bf16 "kernel"/"bias" leaves): weights are quantized
per-output-channel symmetric int8 at trace time (XLA hoists the
loop-invariant quantization out of the sampling scan, so it happens once),
activations per-tensor dynamic symmetric int8, accumulation in int32, and
the (s_x * s_w) rescale + bias applied in the compute dtype.

Policy: `set_policy("int8")` BEFORE building/jitting a model switches every
`conv3`/`dense` call site that doesn't opt out (tiny accuracy-critical
layers like time-embed MLPs pass quant=False). Serving-only: gradients are
not defined through the rounding.

No counterpart in the reference (fp16 `net.half()` is its only reduced-
precision path, app.py:255-263); this is TPU-native headroom.
"""
from __future__ import annotations

import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_POLICY: str | None = None


def set_policy(policy: str | None):
    """'int8' or None. Must be set before model build/trace; jitted
    functions traced under one policy do not retrace on change."""
    global _POLICY
    if policy not in (None, "int8", "int8_calib"):
        raise ValueError(policy)
    _POLICY = policy


def get_policy() -> str | None:
    return _POLICY


# ---- per-site policy ---------------------------------------------------
#
# The int8 convert/GN-stat tax is a PER-SITE sum (34% of the serving step,
# PERF.md batch-16 trace) while the MXU gain varies wildly across sites —
# a site filter lets serving keep int8 only where it pays. Sites are
# identified by their flax module path + input channel count; the filter is
# read at TRACE time (jits traced under one filter do not retrace — the
# sampler jit cache keys on site_filter_key()). Calibration ignores the
# filter (scales exist for every site, so any subset can serve from one
# calibration). scripts/int8_sites.py measures the leave-one-class-out
# ladder that sets the default.

_SITE_FILTER = None       # callable(path: str, cin: int) -> bool (True=int8)
_SITE_FILTER_KEY: str = ""


def _compile_site_spec(spec: str):
    """Comma-separated ``pattern[@cin]`` entries naming site classes to
    DISABLE (run in the compute dtype). ``pattern`` substring-matches the
    site's module path (e.g. ``in_layers.2``, ``qkv``, ``to_out.0``,
    ``ff/net``); ``@cin`` restricts to sites with that input channel
    count (``@*`` or absent = any)."""
    rules = []
    for ent in spec.split(","):
        ent = ent.strip().lstrip("-")
        if not ent:
            continue
        pat, _, ch = ent.partition("@")
        rules.append((pat, None if ch in ("", "*") else int(ch)))

    def fn(path: str, cin: int) -> bool:
        for pat, ch in rules:
            if pat in path and (ch is None or ch == cin):
                return False
        return True

    return fn


def set_site_filter(spec):
    """None (all sites int8 — default), a ``pattern[@cin]`` spec string of
    classes to drop to bf16, or a callable(path, cin) -> bool."""
    global _SITE_FILTER, _SITE_FILTER_KEY
    if spec is None or spec == "":
        _SITE_FILTER, _SITE_FILTER_KEY = None, ""
    elif isinstance(spec, str):
        _SITE_FILTER, _SITE_FILTER_KEY = _compile_site_spec(spec), spec
    else:
        _SITE_FILTER, _SITE_FILTER_KEY = spec, repr(spec)


def site_filter_key() -> str:
    """Hashable descriptor of the active filter for jit-cache keys."""
    return _SITE_FILTER_KEY


def _module_path(mod) -> str:
    try:
        return "/".join(str(p) for p in mod.path)
    except Exception:
        scope = getattr(mod, "scope", None)
        return "/".join(str(p) for p in getattr(scope, "path", ()) or ())


def _site_enabled(mod, cin: int, suffix: str = "") -> bool:
    """True when this call site should run int8 under the active filter.
    Calibration always runs every site (any serving subset reuses one
    calibration pass)."""
    if _SITE_FILTER is None or get_policy() == "int8_calib":
        return True
    return _SITE_FILTER(_module_path(mod) + suffix, cin)


def _quantize_weight(w, reduce_axes):
    """Symmetric per-output-channel int8: returns (int8 w, f32 scale)."""
    s = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes, keepdims=True)
    s = jnp.maximum(s / 127.0, 1e-10)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return wq, s


def _quantize_act(x, s=None):
    """Symmetric per-tensor int8; dynamic absmax when no static scale given.

    Static (calibrated) scales are strongly preferred on TPU: the dynamic
    absmax costs a full serialized pass over the activation before the conv
    can start — measured 64 vs 38 ms/step on the full UNet (PERF.md r2).

    VDTPU_QUANT_BF16=1 runs the scale+round in bf16 instead of f32,
    skipping one convert/relayout stage per pass (int8's (32,128) tiling
    makes converts expensive); worst case one off-by-one code near +-127
    (bf16 rel err 2^-8) — gated by the trajectory tests."""
    if s is not None and os.environ.get("VDTPU_QUANT_BF16") == "1":
        inv = (1.0 / s).astype(jnp.bfloat16)
        xq = jnp.clip(jnp.round(x.astype(jnp.bfloat16) * inv),
                      -127, 127).astype(jnp.int8)
        return xq, s
    if s is None:
        s = jnp.max(jnp.abs(x.astype(jnp.float32)))
        s = jnp.maximum(s / 127.0, 1e-10)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return xq, s


def _calib_stat(x):
    """Per-site activation statistic sow'd during calibration.

    Default is the plain absmax (full-range symmetric int8). VDTPU_INT8_CLIP
    selects a robust alternative so rare outliers stop dilating the scale
    (everything past 127*scale saturates at the clip point instead):
      - "q<p>"     per-batch |x| quantile, e.g. q99.9 (max across batches);
      - "sigma<k>" min(absmax, k * rms) — cheap Gaussian-tail clip.
    The statistic feeds the SAME 'act_absmax' sow key, so _to_scales, the
    weight-table pass and every serving executable are untouched — scales
    are runtime args to the cached jits. Read at calibration trace time
    (calibrate() builds fresh jits per call)."""
    ax = jnp.abs(x.astype(jnp.float32))
    mode = os.environ.get("VDTPU_INT8_CLIP", "")
    if mode.startswith("q"):
        return jnp.quantile(ax.reshape(-1), float(mode[1:]) / 100.0)
    if mode.startswith("sigma"):
        rms = jnp.sqrt(jnp.mean(jnp.square(ax)))
        return jnp.minimum(jnp.max(ax), float(mode[5:]) * rms)
    return jnp.max(ax)


class _QBase(nn.Module):
    """Shared activation-scale logic: calibration sow + static-scale read."""

    def _act(self, x):
        if get_policy() == "int8_calib":
            # record the running absmax (or clipped stat) for this call site
            self.sow("quant_calib", "act_absmax", _calib_stat(x),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.float32(0.0))
            return _quantize_act(x)
        if self.has_variable("quant", "act_scale"):
            s = self.get_variable("quant", "act_scale")
            return _quantize_act(x, s)
        return _quantize_act(x)

    def _weights(self, kernel, reduce_axes):
        """int8 weights: precomputed tables from the quant collection when
        present (calibrate() materializes them — in-graph quantization
        inside the sampling scan is NOT reliably hoisted once Pallas
        custom-calls appear in the loop body: 63 vs 38 ms/step, PERF.md r2),
        else quantized in-graph (XLA hoists it in pure-XLA loops)."""
        if self.has_variable("quant", "w_q"):
            return (self.get_variable("quant", "w_q"),
                    self.get_variable("quant", "w_scale"))
        return _quantize_weight(kernel, reduce_axes)

    def _act_with_prologue(self, x, gn):
        """GN(+SiLU) prologue fused with this site's quantization.

        gn = (gn_scale, gn_bias, with_silu, eps). Modes (VDTPU_QCONV_GN):
        - "1": full Pallas GN+SiLU+quantize (gn_silu_q) when the slab is
          VMEM-coverable (measured NET NEGATIVE e2e on v5e — see
          blocks.ResBlock2D note — kept for other backends/shapes);
        - "stats": Pallas computes ONLY the GN statistics
          (pallas.gn_silu.gn_stats); apply+SiLU+quantize stays a jnp/XLA
          fusion, so no custom-call output feeds the conv.
        Otherwise the jnp prologue runs and the plain activation-quant path
        follows.
        """
        from vdtpu.ops.pallas.gn_silu import (
            _ref_gn_silu, eligible, gn_silu_q, gn_stats)
        gs, gb, with_silu, eps = gn
        mode = os.environ.get("VDTPU_QCONV_GN", "0")
        has_static = (get_policy() != "int8_calib"
                      and self.has_variable("quant", "act_scale"))
        shape = x.shape
        if mode == "stats":
            on_tpu = jax.devices()[0].platform == "tpu"
            stats = gn_stats(x, 32, eps, interpret=not on_tpu) \
                if (shape[1] * shape[2]) >= 256 else None
            if stats is not None:
                h = (x.astype(jnp.float32).reshape(shape[0], -1, shape[-1])
                     - stats[:, 0:1, :]) * stats[:, 1:2, :]
                h = h * gs.astype(jnp.float32) + gb.astype(jnp.float32)
                if with_silu:
                    h = h * jax.nn.sigmoid(h)
                return self._act(h.reshape(shape).astype(x.dtype))
        if mode == "1" and has_static and eligible(x.shape, x.dtype,
                                                   out_itemsize=1):
            s = self.get_variable("quant", "act_scale")
            xq = gn_silu_q(x.reshape(shape[0], -1, shape[-1]), gs, gb,
                           jnp.asarray(s), 32, eps, with_silu).reshape(shape)
            return xq, s
        h = _ref_gn_silu(x.reshape(shape[0], -1, shape[-1]), gs, gb, 32, eps,
                         with_silu).reshape(shape)
        return self._act(h)


def fused_proj(owner: nn.Module, x, kernels, dtype, suffix: str = ""):
    """Project ``x`` through several kernels sharing ONE activation quantize.

    Used by transformer.CrossAttention for the q/k/v projections: under the
    int8 policy each QDense call site quantizes its input separately, so the
    self-attention sites pay three identical bf16->s8 passes over the same
    tensor (part of the 34%-of-step convert bucket, PERF.md r2 batch-16
    trace). Here the input is quantized once; outputs are numerically
    IDENTICAL to the unfused path because (a) weight scales are
    per-output-channel either way and (b) the per-site activation scales were
    already equal (same input tensor -> same calibrated absmax).

    ``owner`` holds the calibration state at its own scope ("act_scale" /
    "w_q" (+``suffix``) in the 'quant' collection — calibrate() recognizes
    fused sites in _attach_weight_tables). Returns one output per kernel.

    VDTPU_QKV=packed additionally concatenates the kernels into a single
    wide matmul and splits the result — a bigger MXU op, but the split
    materializes copies; measured per-backend.
    """
    pol = get_policy()
    if pol is None or not _site_enabled(owner, x.shape[-1],
                                        suffix="/qkv" + suffix):
        xc = x.astype(dtype)
        return [xc @ w.astype(dtype) for w in kernels]
    nbatch = x.ndim - 1
    if pol == "int8_calib":
        owner.sow("quant_calib", "act_absmax" + suffix, _calib_stat(x),
                  reduce_fn=jnp.maximum, init_fn=lambda: jnp.float32(0.0))
        xq, s_x = _quantize_act(x)
        tables = [_quantize_weight(w, (0,)) for w in kernels]
    else:
        s = (owner.get_variable("quant", "act_scale" + suffix)
             if owner.has_variable("quant", "act_scale" + suffix) else None)
        xq, s_x = _quantize_act(x, s)
        if owner.has_variable("quant", "w_q" + suffix):
            wq_all = owner.get_variable("quant", "w_q" + suffix)
            sw_all = owner.get_variable("quant", "w_scale" + suffix)
            tables, off = [], 0
            for w in kernels:
                f = w.shape[-1]
                tables.append((wq_all[:, off:off + f], sw_all[:, off:off + f]))
                off += f
        else:
            tables = [_quantize_weight(w, (0,)) for w in kernels]

    def matmul(wq, s_w):
        y = lax.dot_general(xq, wq, (((nbatch,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w.reshape((1,) * nbatch + (-1,)))
        return y.astype(dtype)

    if os.environ.get("VDTPU_QKV", "shared") == "packed" and len(kernels) > 1:
        feats = [w.shape[-1] for w in kernels]
        wq = jnp.concatenate([t[0] for t in tables], axis=-1)
        sw = jnp.concatenate([t[1] for t in tables], axis=-1)
        return jnp.split(matmul(wq, sw), np.cumsum(feats)[:-1], axis=-1)
    return [matmul(wq, sw) for wq, sw in tables]


def _merge_max(a, b):
    if a is None:
        return b
    if b is None:
        return a
    if isinstance(a, dict):
        keys = set(a) | set(b)
        return {k: _merge_max(a.get(k), b.get(k)) for k in keys}
    return jax.tree_util.tree_map(jnp.maximum, a, b)


def _to_scales(tree):
    """quant_calib collection (sow'd absmax tuples) -> 'quant' collection."""
    out = {}
    for k, v in tree.items():
        if k.startswith("act_absmax"):  # suffixed at fused sites ("_kv")
            (m,) = v if isinstance(v, tuple) else (v,)
            out["act_scale" + k[len("act_absmax"):]] = jnp.maximum(m / 127.0, 1e-10)
        elif k == "attn_logit_max":
            # max scaled logit observed -> softmax shift for the no-max
            # serving kernel (transformer.CrossAttention._logit_shift)
            (m,) = v if isinstance(v, tuple) else (v,)
            out["attn_shift"] = m
        elif isinstance(v, dict):
            out[k] = _to_scales(v)
        else:
            out[k] = v
    return out


def calibrate(model, params, flow_inputs):
    """Post-training calibration of per-call-site activation scales.

    flow_inputs: iterable of (x, t, ctx, x_type, c_type) batches spanning the
    timestep range (activation magnitudes vary along the diffusion
    trajectory). Sets model.quant_scales (the 'quant' collection consumed by
    QConv/QDense) and returns it. Run under set_policy('int8') BEFORE any
    serving jit — static scales are what make int8 pay on TPU (module
    docstring).
    """
    if get_policy() not in ("int8", "int8_calib"):
        raise RuntimeError("calibrate() requires the int8 policy active "
                           "at model build time")
    old = get_policy()
    set_policy("int8_calib")
    try:
        agg = None
        jrun = {}  # one jitted capture fn per flow signature
        for x, t, ctx, x_type, c_type in flow_inputs:
            if (x_type, c_type) not in jrun:
                def run(p, x, t, ctx, _xt=x_type, _ct=c_type):
                    return model.diffuser.apply(
                        {"params": model._diffuser_params(p)}, x, t, ctx,
                        _xt, _ct, method=type(model.diffuser).apply_flow,
                        mutable=["quant_calib"])
                jrun[(x_type, c_type)] = jax.jit(run)
            _, col = jrun[(x_type, c_type)](params, x, t, ctx)
            agg = _merge_max(agg, dict(col["quant_calib"]))
    finally:
        set_policy(old)
    scales = _to_scales(agg)
    _attach_weight_tables(scales, model._diffuser_params(params))
    model.quant_scales = scales
    return model.quant_scales


def _attach_weight_tables(scales: dict, params):
    """Materialize per-site int8 weights + scales into the quant collection.

    Sites are exactly the modules that sowed an act_scale during
    calibration; their param subtree holds the f32/bf16 kernel. One jitted
    pass quantizes everything (per-leaf eager dispatch is slow through a
    remote-device tunnel)."""
    sites = []  # (scales path, key suffix, [kernels to concat])

    def walk(sc, pp, path):
        for k, v in list(sc.items()):
            if isinstance(v, dict):
                sub = pp.get(k, {}) if hasattr(pp, "get") else {}
                if "act_scale" in v:
                    if "kernel" in sub:
                        sites.append((path + (k,), "", [sub["kernel"]]))
                    elif "to_q" in sub:
                        # fused q/k/v site (transformer.CrossAttention via
                        # fused_proj): cross-attention splits into a q site
                        # ("") and a k|v site ("_kv") on the context input
                        names = ("to_q",) if "act_scale_kv" in v \
                            else ("to_q", "to_k", "to_v")
                        sites.append((path + (k,), "",
                                      [sub[n]["kernel"] for n in names]))
                if "act_scale_kv" in v and "to_k" in sub:
                    sites.append((path + (k,), "_kv",
                                  [sub["to_k"]["kernel"], sub["to_v"]["kernel"]]))
                walk(v, sub, path + (k,))

    walk(scales, params, ())

    @jax.jit
    def qall(kernel_groups):
        out = []
        for kerns in kernel_groups:
            kern = kerns[0] if len(kerns) == 1 else jnp.concatenate(kerns, axis=-1)
            out.append(_quantize_weight(kern, tuple(range(kern.ndim - 1))))
        return out

    tables = qall([ks for _, _, ks in sites])
    for (path, suffix, _), (wq, sw) in zip(sites, tables):
        node = scales
        for k in path:
            node = node[k]
        node["w_q" + suffix], node["w_scale" + suffix] = wq, sw


class QConv(_QBase):
    """int8 2-D conv, param-compatible with nn.Conv (NHWC, HWIO kernel)."""
    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[tuple[int, int], tuple[int, int]] | str = ((1, 1), (1, 1))
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, gn=None, add=None, flat_hw=None):
        """add: optional tensor (broadcastable to the output) summed in the
        f32 epilogue — fusing FiLM/residual adds into the conv output saves
        a full read+write pass over the activation (the elementwise passes
        are HBM-bound at ~300 GB/s effective on this chip, PERF.md r2).

        flat_hw=(H, W): x is UNPADDED flat [B, H*W, C] (ops.pallas.qconv —
        row wrap is handled by in-kernel column masks, not padding) and the
        ENTIRE site — GN stats+apply+SiLU+quantize+conv+dequant+adds —
        runs as one fused Pallas kernel (VDTPU_QCONV=fused)."""
        if flat_hw is not None:
            return self._call_flat(x, gn, add, flat_hw)
        kh, kw = self.kernel_size
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features))
        # int8 loses below ~16x16 spatial (8x8x1280: 17.9 vs 22.1 bf16
        # TFLOP/s on v5e — quantize overhead outweighs the MXU win on tiny
        # GEMMs); same params either way, so the fallback is free. The
        # per-site filter (set_site_filter) routes dropped classes through
        # the same compute-dtype path.
        if x.shape[1] * x.shape[2] < int(os.environ.get(
                "VDTPU_INT8_MIN_PIXELS", "256")) \
                or not _site_enabled(self, x.shape[-1]):
            if gn is not None:
                from vdtpu.ops.pallas.gn_silu import _ref_gn_silu
                gs, gb, with_silu, eps = gn
                shape = x.shape
                x = _ref_gn_silu(x.reshape(shape[0], -1, shape[-1]), gs, gb,
                                 32, eps, with_silu).reshape(shape)
            dims = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                              ("NHWC", "HWIO", "NHWC"))
            pad = self.padding if isinstance(self.padding, str) else list(self.padding)
            y = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), self.strides,
                pad, dimension_numbers=dims)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros, (self.features,))
                y = y + bias.astype(self.dtype)
            return y if add is None else y + add.astype(self.dtype)
        wq, s_w = self._weights(kernel, (0, 1, 2))  # s_w [1,1,1,cout]
        xq, s_x = self._act(x) if gn is None else self._act_with_prologue(x, gn)
        pad = self.padding
        if isinstance(pad, str):
            dims = lax.conv_dimension_numbers(x.shape, wq.shape,
                                              ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                xq, wq, self.strides, pad, dimension_numbers=dims,
                preferred_element_type=jnp.int32)
        else:
            dims = lax.conv_dimension_numbers(x.shape, wq.shape,
                                              ("NHWC", "HWIO", "NHWC"))
            y = lax.conv_general_dilated(
                xq, wq, self.strides, list(pad), dimension_numbers=dims,
                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w.reshape(1, 1, 1, -1))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        if add is not None:
            y = y + add.astype(jnp.float32)
        return y.astype(self.dtype)


    def has_tables(self) -> bool:
        """True when calibrated static tables exist for this site."""
        return self.has_variable("quant", "act_scale")

    def tables(self, cin: int):
        """(w_q, w_scale, bias, act_scale) for an externally-fused kernel
        (blocks.ResBlock2D whole-block path). READS the params __call__
        owns (param creation is only legal inside the compact method;
        init/calibration always run the per-conv path first, so they exist
        whenever has_tables() is true)."""
        del cin
        kernel = self.get_variable("params", "kernel")
        bias = self.get_variable("params", "bias") if self.use_bias \
            else jnp.zeros((self.features,), jnp.float32)
        wq, s_w = self._weights(kernel, tuple(range(kernel.ndim - 1)))
        return wq, s_w, bias, jnp.asarray(
            self.get_variable("quant", "act_scale"))

    def _call_flat(self, x, gn, add, flat_hw):
        """Flat fused path (see __call__): x is [B, H*W, C] (a free reshape
        of NHWC). Same param/quant tree as the standard path: calibration
        sows the same act_absmax and _attach_weight_tables finds the same
        'kernel'."""
        from vdtpu.ops.pallas import qconv as qc
        h, w = flat_hw
        gs, gb, with_silu, eps = gn
        kh, kw = self.kernel_size
        assert (kh, kw) == (3, 3) and self.strides == (1, 1), \
            "flat path covers the ResBlock 3x3 stride-1 convs"
        kernel = self.param("kernel", self.kernel_init,
                            (kh, kw, x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,)) \
            if self.use_bias else jnp.zeros((self.features,), jnp.float32)
        add_vec = add_full = None
        if add is not None:
            if add.ndim == 3 and add.shape[1] == 1:
                add_vec = add.reshape(add.shape[0], -1)   # FiLM [B, N]
            else:
                add_full = add                            # flat skip
        if get_policy() == "int8_calib" or not self.has_variable(
                "quant", "act_scale"):
            # reference math; dynamic scale (same tensor as standard path)
            from vdtpu.ops.pallas.gn_silu import _ref_gn_silu
            y = _ref_gn_silu(x, gs, gb, 32, eps, with_silu)
            absmax = jnp.max(jnp.abs(y.astype(jnp.float32)))
            if get_policy() == "int8_calib":
                self.sow("quant_calib", "act_absmax", absmax,
                         reduce_fn=jnp.maximum,
                         init_fn=lambda: jnp.float32(0.0))
            s_act = jnp.maximum(absmax / 127.0, 1e-10)
            wq, s_w = self._weights(kernel, (0, 1, 2))
            return qc.ref_qconv3_flat(
                x, gs, gb, s_act, wq, s_w, bias, h, w, eps=eps,
                with_silu=with_silu, add_vec=add_vec, add_full=add_full)
        s_act = self.get_variable("quant", "act_scale")
        wq, s_w = self._weights(kernel, (0, 1, 2))
        return qc.qconv3_flat(
            x, gs, gb, jnp.asarray(s_act), wq, s_w, bias, h, w, eps=eps,
            with_silu=with_silu, add_vec=add_vec, add_full=add_full,
            interpret=jax.default_backend() != "tpu")


class QDense(_QBase):
    """int8 matmul over the last axis, param-compatible with nn.Dense."""
    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.lecun_normal()
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, gn=None, add=None):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        if not _site_enabled(self, x.shape[-1]):
            # per-site filter dropped this class: compute-dtype matmul with
            # the same params (and the same fused gn/add epilogue contract)
            if gn is not None:
                from vdtpu.ops.pallas.gn_silu import _ref_gn_silu
                gs, gb, with_silu, eps = gn
                shape = x.shape
                x = _ref_gn_silu(x.reshape(shape[0], -1, shape[-1]), gs, gb,
                                 32, eps, with_silu).reshape(shape)
            y = x.astype(self.dtype) @ kernel.astype(self.dtype)
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
                y = y + bias.astype(self.dtype)
            return y if add is None else y + add.astype(self.dtype)
        wq, s_w = self._weights(kernel, (0,))  # s_w [1, f]
        xq, s_x = self._act(x) if gn is None else self._act_with_prologue(x, gn)
        y = lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (s_x * s_w.reshape((1,) * (x.ndim - 1) + (-1,)))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(jnp.float32)
        if add is not None:  # fused residual (see QConv)
            y = y + add.astype(jnp.float32)
        return y.astype(self.dtype)


# Env hookup for the measurement scripts: VDTPU_INT8_SITES holds a
# set_site_filter() spec string (classes to drop to bf16).
if os.environ.get("VDTPU_INT8_SITES"):
    set_site_filter(os.environ["VDTPU_INT8_SITES"])
