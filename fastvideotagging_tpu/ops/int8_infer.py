"""int8 post-training-quantized inference engine for R(2+1)D (serving).

TPU MXUs run int8 matmuls at 2x the bf16 rate (v5e: 394 vs 197 T/s) and
int8 activations halve HBM traffic. Measured on v5e (2026-08-16, sound
carry-through protocol): stage-1 spatial conv 1.33 ms int8+requant vs
4.04 ms bf16 — 3x at the op level, ~1.4x end to end. The reference stack
has no quantized path at all; this is a TPU-native addition on top of the
C17 serving surface.

Scheme — SmoothQuant-style static weight smoothing + per-tensor activation
scales, every choice fixed by measurement on the hard 50-class motion
benchmark (benchmarks/int8_serving.py; final record: top-1 0.97 == bf16
parity at 1.28x serving speedup, INT8_SERVING.json):

  * weights: symmetric int8, per-output-channel scales, quantized AFTER
    folding in per-input-channel smoothing factors f_c = sqrt(A_c / W_c)
    (A_c = calibrated per-channel activation absmax, W_c = consumer-kernel
    per-input-channel weight absmax) — activations and weights each absorb
    half the channel disparity; f clamped to a 10x band (unclamped dead-
    channel factors amplified numerical junk 2e4x and zeroed the signal);
  * activations: x' = x / f_c, then a per-tensor scale — STATIC calibrated
    scalar with 2x headroom (default: the whole requant fuses into the conv
    epilogue, margin 1.0/1.5/2.0 measured 0.875/0.965/0.97 top-1) or
    DYNAMIC in-graph amax (`dynamic=True`: no calibration drift, no
    clipping, but the amax pass costs ~35%% throughput);
  * each conv runs int8 x int8 -> int32 on the MXU; the epilogue
    (dequant * w_scale[c] * s, folded BatchNorm affine, ReLU) is one fused
    multiply-add over the int32 accumulator;
  * residual adds, pool and head run in f32;
  * mixed precision: ``float_blocks`` run in bf16 with exactly-dequantized
    weights (the late 512-channel blocks sit behind heavy main-path/
    residual cancellation — mean |block output| is ~20x smaller than its
    branches — which amplifies ANY upstream noise; measured per-site error
    jumps 0.02 -> 0.56 across that add regardless of scale scheme).

Measured failure register (per-site attribution via debug_sites):
  * static per-TENSOR activation scales: stage-4 channel disparity lands on
    the activations (site error 0.56-1.39, top-1 5.5% vs bf16 97%);
  * EXACT per-channel fold (scales = A_c/127 into weights): the disparity
    lands on the 8-bit weight rows instead — small-scale channels' weights
    round to zero (top-1 5%);
  * static smoothing alone: site error uniform ~3% (absmax rounding floor),
    top-1 85-93% depending on how many blocks stay bf16.

Parity contract: same layer walk as ops/fused_infer.r2plus1d_fused_infer
(the params-as-data serving engine), which is itself parity-tested against
model.apply(train=False). Accuracy gate: benchmarks/INT8_SERVING.json,
thresholds in tests/test_int8_infer.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from fastvideotagging_tpu.ops.fused_block import fold_bn


def _conv_i8(x, w, strides):
    """int8 x int8 -> int32 conv, symmetric k//2 padding (layers semantics)."""
    pad = tuple((k // 2, k // 2) for k in w.shape[:3])
    return lax.conv_general_dilated(
        x, w, window_strides=strides, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.int32)


def _quant_w(w):
    """(..., Cout) weights -> (int8 weights, per-out-channel f32 scales)."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def _dyn_quant(x, inv_f):
    """Smooth + dynamically quantize: x' = x * inv_f, s = amax|x'|/127.

    Returns (int8 q, f32 scalar s); x ~= (q * s) / inv_f exactly up to
    rounding — never clips, no calibration drift."""
    xs = x.astype(jnp.float32) * inv_f
    s = jnp.maximum(jnp.max(jnp.abs(xs)), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xs / s), -127, 127).astype(jnp.int8)
    return q, s


# ---------------------------------------------------------------------------
# Calibration: per-channel absmax of every conv-input site through the bf16
# reference walk. Site names are stable keys shared with the engine.
# ---------------------------------------------------------------------------


def _bf16_conv(x, kernel, strides):
    pad = tuple((k // 2, k // 2) for k in kernel.shape[:3])
    return lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=strides, padding=pad,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))


def _affine(x, scale, bias, relu=False):
    y = x.astype(jnp.float32) * scale + bias
    if relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def _bn(p, s, name):
    # models.layers.Norm wraps the flax BatchNorm as child "BatchNorm_0"
    return fold_bn(p[name]["BatchNorm_0"]["scale"],
                   p[name]["BatchNorm_0"]["bias"],
                   s[name]["BatchNorm_0"]["mean"],
                   s[name]["BatchNorm_0"]["var"])


def _walk(variables, x, stage_blocks, record):
    """Shared bf16 layer walk; `record(site, tensor)` sees every conv input
    and must return the tensor to feed forward. With record=lambda n, t: t
    this IS the reference engine."""
    p, s = variables["params"], variables["batch_stats"]
    y = record("input", x.astype(jnp.bfloat16))
    y = _bf16_conv(y, p["stem_spatial"]["kernel"], (1, 2, 2))
    y = _affine(y, *_bn(p, s, "stem_bn1"), relu=True)
    y = record("stem_mid", y)
    y = _bf16_conv(y, p["stem_temporal"]["kernel"], (1, 1, 1))
    y = _affine(y, *_bn(p, s, "stem_bn2"), relu=True)

    for stage, num_blocks in enumerate(stage_blocks):
        for block in range(num_blocks):
            stride = 2 if (stage > 0 and block == 0) else 1
            key = f"stage{stage + 1}_block{block}"
            bp, bs = p[key], s[key]
            y = record(f"{key}.in", y)
            residual = y
            z = y
            for ci, (cname, st) in enumerate((("conv1", stride),
                                              ("conv2", 1))):
                cp, cs = bp[cname], bs[cname]
                z = _bf16_conv(z, cp["spatial"]["kernel"], (1, st, st))
                z = _affine(z, *_bn(cp, cs, "bn_mid"), relu=True)
                z = record(f"{key}.{cname}.mid", z)
                z = _bf16_conv(z, cp["temporal"]["kernel"], (st, 1, 1))
                z = _affine(z, *_bn(bp, bs, f"bn{ci + 1}"),
                            relu=(ci == 0))
                if ci == 0:
                    z = record(f"{key}.conv2.in", z)
            if "downsample" in bp:
                residual = _bf16_conv(residual, bp["downsample"]["kernel"],
                                      (stride, stride, stride))
                residual = _affine(residual, *_bn(bp, bs, "bn_down"))
            y = jnp.maximum(z.astype(jnp.float32)
                            + residual.astype(jnp.float32),
                            0.0).astype(jnp.bfloat16)

    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2, 3))
    logits = pooled @ p["fc"]["kernel"] + p["fc"]["bias"]
    return logits.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("stage_blocks",))
def _calibrate_sites(variables, x, stage_blocks):
    """One jitted calibration pass -> {site: (C,) f32 absmax}.

    Module-level so the compile is shared across calibrate() calls:
    Tagger's per-video self-calibration (evaluation/tagger.py) re-enters
    here with the same shapes/structure and hits the jit cache instead of
    recompiling the full bf16 walk per video (ADVICE r2, medium)."""
    sites = {}

    def record(name, t):
        tf = jnp.abs(t.astype(jnp.float32))
        sites[name] = jnp.max(tf, axis=tuple(range(tf.ndim - 1)))
        return t

    _walk(variables, x, stage_blocks, record)
    return sites


def calibrate(variables, batches, stage_blocks=(2, 2, 2, 2)):
    """-> {site: (C,) f32 per-channel activation absmax/127} over batches.

    Only used to derive the static smoothing factors (the activation
    scales themselves are dynamic, computed in-graph per batch), so a
    handful of batches suffices.

    `batches`: iterable of (B, T, H, W, 3) preprocessed clips (the same
    tensors the bf16 model consumes)."""
    maxima: dict[str, np.ndarray] = {}

    for x in batches:
        sites = jax.device_get(
            _calibrate_sites(variables, jnp.asarray(x), tuple(stage_blocks)))
        for k, v in sites.items():
            v = np.asarray(v, np.float64)
            maxima[k] = v if k not in maxima else np.maximum(maxima[k], v)
    return {k: np.maximum(v, 1e-12) / 127.0 for k, v in maxima.items()}


# ---------------------------------------------------------------------------
# Quantized pack + engine
# ---------------------------------------------------------------------------


def _smooth_factors(act_absmax, consumers):
    """{site: (C,) smoothing factors f_c = sqrt(A_c / W_c)}, median-1.

    The engine computes x' = x / f_c before dynamic quantization and
    quantize_variables folds f_c into the consumer kernels' input-channel
    dim (exact: the conv is linear per input channel). Balancing with the
    square root splits the channel disparity evenly between the activation
    tensor and the int8 weight rows — either side alone is a measured
    failure (module docstring)."""
    out = {}
    for site, amax in act_absmax.items():
        a = np.maximum(np.asarray(amax, np.float64) * 127.0, 1e-8)
        w_col = np.zeros_like(a)
        for kern in consumers.get(site, ()):
            k = np.abs(np.asarray(kern, np.float64))
            w_col = np.maximum(
                w_col, k.max(axis=tuple(i for i in range(k.ndim)
                                        if i != k.ndim - 2)))
        f = np.sqrt(a / np.maximum(w_col, 1e-8))
        f = f / np.median(f)
        # clamp: a DEAD calibration channel (A_c ~ 0) would get f ~ 0 and
        # the engine would multiply that channel's numerical junk by 1/f
        # (measured 2e4x), blowing up the dynamic amax and quantizing every
        # real channel to zero. Dead/outlier channels don't need balanced
        # precision — a 10x band captures all the useful equalization.
        out[site] = np.asarray(np.clip(f, 0.1, 10.0), np.float64)
    return out


def quantize_variables(variables, act_scales, stage_blocks=(2, 2, 2, 2),
                       static_margin: float = 2.0):
    """-> qpack: int8 weights + epilogue constants, params-as-data.

    ``act_scales``: calibrate()'s per-channel absmax/127 vectors, used to
    derive the smoothing factors folded into each kernel.

    ``static_margin``: headroom multiplier on the static per-site scalar
    scales (the fast fused-requant path clips anything beyond the
    calibrated absmax; eval data routinely exceeds it — measured top-1
    0.875 / 0.965 / 0.97 at margin 1.0 / 1.5 / 2.0 vs bf16 0.97, so the
    one-bit headroom of 2.0 restores full parity). Irrelevant to the
    dynamic mode."""
    p, s = variables["params"], variables["batch_stats"]

    consumers = {"input": [p["stem_spatial"]["kernel"]],
                 "stem_mid": [p["stem_temporal"]["kernel"]]}
    for stage, num_blocks in enumerate(stage_blocks):
        for block in range(num_blocks):
            key = f"stage{stage + 1}_block{block}"
            bp = p[key]
            ins = [bp["conv1"]["spatial"]["kernel"]]
            if "downsample" in bp:
                ins.append(bp["downsample"]["kernel"])
            consumers[f"{key}.in"] = ins
            consumers[f"{key}.conv1.mid"] = [bp["conv1"]["temporal"]["kernel"]]
            consumers[f"{key}.conv2.in"] = [bp["conv2"]["spatial"]["kernel"]]
            consumers[f"{key}.conv2.mid"] = [bp["conv2"]["temporal"]["kernel"]]
    factors = _smooth_factors(act_scales, consumers)

    def conv_pack(kernel, bn_scale, bn_bias, in_site):
        k = jnp.asarray(kernel, jnp.float32)
        f_in = jnp.asarray(factors[in_site], jnp.float32)  # (Cin,)
        qw, w_scale = _quant_w(k * f_in[:, None])
        # the UNfolded bf16 kernel for float blocks is recovered as
        # w * w_scale / f_in (deq_w in the engine)
        return {"w": qw, "w_scale": w_scale, "f_in": f_in,
                "mul": w_scale * bn_scale, "add": bn_bias,
                "bn_scale": bn_scale, "bn_bias": bn_bias}

    # static per-site scalar scales for the fused-requant fast path:
    # x' = x / f_c has calibrated absmax A_c / f_c; one scalar covers it
    s_static = {site: jnp.float32(
        float(np.max(np.asarray(act_scales[site], np.float64) * 127.0
                     / factors[site]) / 127.0) * static_margin)
        for site in factors}
    out = {"inv_f": {k: jnp.asarray(1.0 / v, jnp.float32)
                     for k, v in factors.items()},
           "s_static": s_static,
           "stage_blocks": tuple(stage_blocks)}
    out["stem_spatial"] = conv_pack(p["stem_spatial"]["kernel"],
                                    *_bn(p, s, "stem_bn1"), "input")
    out["stem_temporal"] = conv_pack(p["stem_temporal"]["kernel"],
                                     *_bn(p, s, "stem_bn2"), "stem_mid")
    for stage, num_blocks in enumerate(stage_blocks):
        for block in range(num_blocks):
            key = f"stage{stage + 1}_block{block}"
            bp, bs = p[key], s[key]
            blk = {}
            for ci, cname in enumerate(("conv1", "conv2")):
                cp, cs = bp[cname], bs[cname]
                in_site = f"{key}.in" if ci == 0 else f"{key}.conv2.in"
                blk[f"{cname}_spatial"] = conv_pack(
                    cp["spatial"]["kernel"], *_bn(cp, cs, "bn_mid"), in_site)
                blk[f"{cname}_temporal"] = conv_pack(
                    cp["temporal"]["kernel"], *_bn(bp, bs, f"bn{ci + 1}"),
                    f"{key}.{cname}.mid")
            if "downsample" in bp:
                blk["downsample"] = conv_pack(
                    bp["downsample"]["kernel"], *_bn(bp, bs, "bn_down"),
                    f"{key}.in")
            out[key] = blk
    out["fc"] = {"kernel": jnp.asarray(p["fc"]["kernel"], jnp.float32),
                 "bias": jnp.asarray(p["fc"]["bias"], jnp.float32)}
    return out


# Measured on the hard-benchmark model: the late blocks sit behind heavy
# main-path/residual cancellation (mean |block output| ~20x smaller than
# its branches), which amplifies any upstream quantization noise — keep
# them bf16 by default. stage4 carries a small share of serving time.
DEFAULT_FLOAT_BLOCKS = ("stage4_block0", "stage4_block1")


@functools.partial(jax.jit, static_argnames=("stage_blocks", "float_blocks",
                                             "dynamic", "residual",
                                             "debug_sites"))
def r2plus1d_int8_infer(qpack, x, stage_blocks=(2, 2, 2, 2),
                        float_blocks=DEFAULT_FLOAT_BLOCKS,
                        dynamic: bool = False, residual: str = "dequant",
                        debug_sites: bool = False):
    """Quantized forward. x: (B, T, H, W, 3) preprocessed f32/bf16 clips
    -> (B, K) f32 logits; with debug_sites=True -> (logits, {site: f32
    reconstructed conv input}) for PTQ error attribution.

    ``float_blocks``: blocks executed in bf16 with exactly-dequantized
    int8 weights (mixed-precision PTQ).

    ``dynamic``: per-tensor activation scales computed in-graph per batch
    (robust to calibration drift, never clips) instead of the calibrated
    static scalars. Measured v5e, B=32 16x112x112 (INT8_SERVING.json):
    static 1400 clips/s = 1.3x over bf16 (the whole requant fuses into
    the conv epilogue), dynamic ~0.85-1.1x (the amax forces an extra
    materialization pass per site) — static is the default; use dynamic
    when calibration data is unrepresentative.

    ``residual``: 'dequant' (default) reconstructs the block input from
    its quantized form, saving a full-tensor bf16 write+read per block
    (1400 vs 1358 clips/s, top-1 parity held — INT8_SERVING.json);
    'exact' adds the unquantized input in f32 for maximum fidelity."""
    inv_f = qpack["inv_f"]
    sites = {}

    def quant_site(y, site):
        if dynamic:
            q, s = _dyn_quant(y, inv_f[site])
        else:
            s = qpack["s_static"][site]
            q = jnp.clip(jnp.round(y.astype(jnp.float32)
                                   * (inv_f[site] / s)),
                         -127, 127).astype(jnp.int8)
        if debug_sites:
            sites[site] = q.astype(jnp.float32) * s / inv_f[site]
        return q, s

    def conv_q(q, s_dyn, pack, strides, relu=True, out_f32=False):
        acc = _conv_i8(q, pack["w"], strides)
        y = (acc.astype(jnp.float32) * (pack["mul"] * s_dyn)
             + pack["add"])
        if relu:
            y = jnp.maximum(y, 0.0)
        return y if out_f32 else y.astype(jnp.bfloat16)

    def deq_w(pack):
        # undo the per-output-channel weight scale AND the folded-in
        # smoothing factors
        return (pack["w"].astype(jnp.float32) * pack["w_scale"]
                / pack["f_in"][:, None]).astype(jnp.bfloat16)

    def conv_f(xf, pack, strides, relu=True):
        """bf16 conv with exactly-dequantized int8 weights + BN affine."""
        acc = _bf16_conv(xf.astype(jnp.bfloat16), deq_w(pack), strides)
        return _affine(acc, pack["bn_scale"], pack["bn_bias"], relu=relu)

    q, s_dyn = quant_site(x, "input")
    y = conv_q(q, s_dyn, qpack["stem_spatial"], (1, 2, 2))
    q, s_dyn = quant_site(y, "stem_mid")
    y = conv_q(q, s_dyn, qpack["stem_temporal"], (1, 1, 1))

    for stage, num_blocks in enumerate(stage_blocks):
        for block in range(num_blocks):
            stride = 2 if (stage > 0 and block == 0) else 1
            key = f"stage{stage + 1}_block{block}"
            blk = qpack[key]
            if key not in float_blocks:
                q_in, s_in = quant_site(y, f"{key}.in")
                q, s_dyn = q_in, s_in
                z = conv_q(q, s_dyn, blk["conv1_spatial"],
                           (1, stride, stride))
                q, s_dyn = quant_site(z, f"{key}.conv1.mid")
                z = conv_q(q, s_dyn, blk["conv1_temporal"], (stride, 1, 1))
                q, s_dyn = quant_site(z, f"{key}.conv2.in")
                z = conv_q(q, s_dyn, blk["conv2_spatial"], (1, 1, 1))
                q, s_dyn = quant_site(z, f"{key}.conv2.mid")
                zf = conv_q(q, s_dyn, blk["conv2_temporal"], (1, 1, 1),
                            relu=False, out_f32=True)
                if "downsample" in blk:
                    rf = conv_q(q_in, s_in, blk["downsample"],
                                (stride, stride, stride),
                                relu=False, out_f32=True)
                elif residual == "dequant":
                    # reconstruct the residual from the quantized input:
                    # the block input never materializes in bf16 (saves a
                    # write+read of the full tensor per block) at the cost
                    # of site-level rounding noise on the residual path
                    rf = q_in.astype(jnp.float32) * (s_in / inv_f[f"{key}.in"])
                else:
                    rf = y.astype(jnp.float32)
            else:
                z = conv_f(y, blk["conv1_spatial"], (1, stride, stride))
                z = conv_f(z, blk["conv1_temporal"], (stride, 1, 1))
                z = conv_f(z, blk["conv2_spatial"], (1, 1, 1))
                zf = conv_f(z, blk["conv2_temporal"], (1, 1, 1),
                            relu=False).astype(jnp.float32)
                if "downsample" in blk:
                    rf = conv_f(y, blk["downsample"],
                                (stride, stride, stride),
                                relu=False).astype(jnp.float32)
                else:
                    rf = y.astype(jnp.float32)
            y = jnp.maximum(zf + rf, 0.0).astype(jnp.bfloat16)

    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2, 3))
    logits = pooled @ qpack["fc"]["kernel"] + qpack["fc"]["bias"]
    logits = logits.astype(jnp.float32)
    return (logits, sites) if debug_sites else logits


def reference_bf16_infer(variables, x, stage_blocks=(2, 2, 2, 2)):
    """The same layer walk in bf16 (calibration graph, record=identity)."""
    return _walk(variables, x, tuple(stage_blocks), lambda n, t: t)
