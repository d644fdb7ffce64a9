"""Slope-method micro-benchmarks for submodule variants on the real chip.

Usage: python scripts/perf_probe.py video|audio|full
Measures (t(scan K) - t(trivial)) / K so the tunnel's fixed per-dispatch
overhead cancels; inputs are generated on device per scan iteration.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = 32
K = 8


def slope_time(fn, params, n_rep=2):
    """fn(params, key) -> scalar. Returns seconds per call, overhead-free."""

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_k(p, seed, k):
        keys = jax.random.split(jax.random.PRNGKey(seed), k)
        acc, _ = jax.lax.scan(lambda c, key: (c + fn(p, key), None), 0.0, keys)
        return acc

    @jax.jit
    def trivial(seed):
        return jnp.sum(jax.random.normal(jax.random.PRNGKey(seed), (8, 8)))

    def timed(seed, k):
        t0 = time.perf_counter()
        assert np.isfinite(float(np.asarray(run_k(params, seed, k))))
        return time.perf_counter() - t0

    def timed_trivial(seed):
        t0 = time.perf_counter()
        float(np.asarray(trivial(seed)))
        return time.perf_counter() - t0

    timed_trivial(0)
    timed(0, K)
    overhead = min(timed_trivial(i) for i in range(1, 6))
    return min(max(timed(1 + r, K) - overhead, 1e-9) / K
               for r in range(n_rep))


def probe_video_mid128():
    """Video trunk at the production midplanes_multiple=128 width."""
    from peppa_tpu.models.video3d import VideoResNetTrunk

    frames, h, w = 23, 100, 180
    mod = VideoResNetTrunk("r2plus1d_18", jnp.bfloat16, jnp.float32,
                           midplanes_multiple=128)
    x0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x0)

    def fn(p, key):
        x = jax.random.uniform(key, (B, frames, h, w, 3), jnp.float32)
        return jnp.sum(mod.apply(p, x).astype(jnp.float32))

    dt = slope_time(fn, params)
    print(f"video mid128: {dt*1000:.1f} ms/batch", flush=True)


def probe_video():
    import jax
    import flax.linen as nn

    from peppa_tpu.models.video3d import VideoResNetTrunk

    frames, h, w = 23, 100, 180
    for name, bn_dtype in (("bn_f32(current)", jnp.float32),
                           ("bn_bf16", jnp.bfloat16)):
        mod = VideoResNetTrunk("r2plus1d_18", jnp.bfloat16, bn_dtype)
        x0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
        params = jax.jit(mod.init)(jax.random.PRNGKey(0), x0)

        def fn(p, key, mod=mod):
            x = jax.random.uniform(key, (B, frames, h, w, 3), jnp.float32)
            return jnp.sum(mod.apply(p, x).astype(jnp.float32))

        dt = slope_time(fn, params)
        print(f"video {name}: {dt*1000:.1f} ms/batch", flush=True)


def probe_video_decomposed():
    """R(2+1)D expressed as conv2d over folded frames + conv1d over time."""
    import flax.linen as nn

    from peppa_tpu.models.video3d import midplanes

    frames, h, w = 23, 100, 180

    class Trunk2D(nn.Module):
        @nn.compact
        def __call__(self, x):  # (B, T, H, W, C)
            dt = jnp.bfloat16

            def spatial(x, ch, k, s, name):
                b, t, hh, ww, c = x.shape
                y = x.reshape(b * t, hh, ww, c)
                y = nn.Conv(ch, (k, k), strides=(s, s),
                            padding=[(k // 2, k // 2)] * 2, use_bias=False,
                            dtype=dt, name=name)(y)
                return y.reshape(b, t, y.shape[1], y.shape[2], ch)

            def temporal(x, ch, k, s, name):
                b, t, hh, ww, c = x.shape
                y = x.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, t, c)
                y = nn.Conv(ch, (k,), strides=(s,),
                            padding=[(k // 2, k // 2)], use_bias=False,
                            dtype=dt, name=name)(y)
                t2 = y.shape[1]
                return y.reshape(b, hh, ww, t2, ch).transpose(0, 3, 1, 2, 4)

            def bn_relu(x, name):
                x = nn.BatchNorm(use_running_average=True, momentum=0.9,
                                 epsilon=1e-5, dtype=jnp.float32,
                                 name=name)(x)
                return nn.relu(x)

            x = x.astype(dt)
            x = bn_relu(spatial(x, 45, 7, 2, "stem_s"), "stem_bn1")
            x = bn_relu(temporal(x, 64, 3, 1, "stem_t"), "stem_bn2")
            widths = (64, 128, 256, 512)
            strides = (1, 2, 2, 2)
            c_in = 64
            for li, (width, s) in enumerate(zip(widths, strides), 1):
                for bi in range(2):
                    st = s if bi == 0 else 1
                    mid = midplanes(c_in, width)
                    idn = x
                    y = bn_relu(spatial(x, mid, 3, st, f"l{li}b{bi}c1s"),
                                f"l{li}b{bi}bnm1")
                    y = temporal(y, width, 3, st, f"l{li}b{bi}c1t")
                    y = bn_relu(y, f"l{li}b{bi}bn1")
                    y = bn_relu(spatial(y, mid, 3, 1, f"l{li}b{bi}c2s"),
                                f"l{li}b{bi}bnm2")
                    y = temporal(y, width, 3, 1, f"l{li}b{bi}c2t")
                    y = nn.BatchNorm(use_running_average=True, momentum=0.9,
                                     epsilon=1e-5, dtype=jnp.float32,
                                     name=f"l{li}b{bi}bn2")(y)
                    if st != 1 or c_in != width:
                        idn = spatial(idn, width, 1, st, f"l{li}b{bi}ds")
                        idn = temporal(idn, width, 1, st, f"l{li}b{bi}dst")
                        idn = nn.BatchNorm(use_running_average=True,
                                           momentum=0.9, epsilon=1e-5,
                                           dtype=jnp.float32,
                                           name=f"l{li}b{bi}bnd")(idn)
                    x = nn.relu(y + idn)
                    c_in = width
            return x

    mod = Trunk2D()
    x0 = jnp.zeros((1, 4, 32, 32, 3), jnp.float32)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), x0)

    def fn(p, key):
        x = jax.random.uniform(key, (B, frames, h, w, 3), jnp.float32)
        return jnp.sum(mod.apply(p, x).astype(jnp.float32))

    dt = slope_time(fn, params)
    print(f"video decomposed-2d1d: {dt*1000:.1f} ms/batch", flush=True)


def probe_audio():
    import flax.linen as nn

    from peppa_tpu.models.wav2vec2 import CONV_LAYERS, gelu

    S = 101430

    class Current(nn.Module):
        @nn.compact
        def __call__(self, w):
            x = w[..., None].astype(jnp.bfloat16)
            for i, (ch, k, s) in enumerate(CONV_LAYERS):
                x = nn.Conv(ch, (k,), strides=(s,), padding="VALID",
                            use_bias=False, dtype=jnp.bfloat16,
                            name=f"conv{i}")(x)
                if i == 0:
                    x = nn.GroupNorm(num_groups=ch, epsilon=1e-5,
                                     dtype=jnp.float32, name="gn")(x)
                x = gelu(x)
            return x

    class FramedMatmul(nn.Module):
        """conv1 as a framed matmul; convs 2+ as im2col matmuls."""

        @nn.compact
        def __call__(self, w):
            b = w.shape[0]
            x = w.astype(jnp.bfloat16)
            # layer 0: k=10, s=5 -> frames of 10 from blocks of 5
            n5 = x.shape[1] // 5
            x5 = x[:, :n5 * 5].reshape(b, n5, 5)
            f10 = jnp.concatenate([x5[:, :-1], x5[:, 1:]], axis=-1)  # (B,n5-1,10)
            w0 = self.param("w0", nn.initializers.lecun_normal(), (10, 512))
            x = f10 @ w0.astype(jnp.bfloat16)
            x = nn.GroupNorm(num_groups=512, epsilon=1e-5, dtype=jnp.float32,
                             name="gn")(x)
            x = gelu(x).astype(jnp.bfloat16)
            for i, (ch, k, s) in enumerate(CONV_LAYERS[1:], 1):
                t_out = (x.shape[1] - k) // s + 1
                idx = jnp.arange(t_out)[:, None] * s + jnp.arange(k)[None, :]
                patches = x[:, idx, :].reshape(b, t_out, k * x.shape[-1])
                wi = self.param(f"w{i}", nn.initializers.lecun_normal(),
                                (k * 512, ch))
                x = gelu(patches @ wi.astype(jnp.bfloat16)).astype(jnp.bfloat16)
            return x

    for name, mod in (("conv(current)", Current()),
                      ("framed_matmul", FramedMatmul())):
        params = jax.jit(mod.init)(jax.random.PRNGKey(0),
                                   jnp.zeros((1, 3200)))

        def fn(p, key, mod=mod):
            a = jax.random.normal(key, (B, S), jnp.float32) * 0.1
            return jnp.sum(mod.apply(p, a).astype(jnp.float32))

        dt = slope_time(fn, params)
        print(f"audio {name}: {dt*1000:.1f} ms/batch", flush=True)


def probe_audio_parts():
    """Split the audio branch: conv extractor / pos-conv / transformer / pool.

    Identifies where the measured ~36 ms (B=32) of transformer+pooling time
    actually goes — in particular the grouped positional conv (k=128,
    groups=16), whose FLOP count (~96 GFLOP/batch at B=32) rivals several
    transformer layers and which grouped-conv lowering may map poorly to the
    MXU.
    """
    from peppa_tpu.models.wav2vec2 import (ConvFeatureExtractor,
                                           ConvPositionalEmbedding,
                                           TransformerLayer, Wav2Vec2Config)

    S = 101430
    T = 316  # conv frames for S samples
    cfg = Wav2Vec2Config()
    dt16 = jnp.bfloat16

    # conv extractor
    mod = ConvFeatureExtractor(dt16)
    params = jax.jit(mod.init)(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))

    def fn(p, key):
        a = jax.random.normal(key, (B, S), jnp.float32) * 0.1
        return jnp.sum(mod.apply(p, a).astype(jnp.float32))

    print(f"audio conv_extractor: {slope_time(fn, params)*1000:.1f} ms/batch",
          flush=True)

    # positional conv
    pos = ConvPositionalEmbedding(cfg, dt16)
    params = jax.jit(pos.init)(jax.random.PRNGKey(0),
                               jnp.zeros((1, T, cfg.embed_dim)))

    def fn(p, key):
        x = jax.random.normal(key, (B, T, cfg.embed_dim), dt16)
        return jnp.sum(pos.apply(p, x).astype(jnp.float32))

    print(f"audio pos_conv: {slope_time(fn, params)*1000:.1f} ms/batch",
          flush=True)

    # one transformer layer (x12 in the model), eval path (pallas attention)
    layer = TransformerLayer(cfg, dt16, use_pallas=True)
    params = layer.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, T, cfg.embed_dim)), None, True)

    def fn(p, key):
        x = jax.random.normal(key, (B, T, cfg.embed_dim), dt16)
        return jnp.sum(layer.apply(p, x, None, True).astype(jnp.float32))

    dt_layer = slope_time(fn, params)
    print(f"audio transformer_layer: {dt_layer*1000:.2f} ms/batch "
          f"(x12 = {dt_layer*12*1000:.1f} ms)", flush=True)


def probe_peak():
    """GEMM peak scan: shapes/dtypes to calibrate the practical-peak number.

    The roofline baseline (71.7 TF/s from one 8192x4096x4096 bf16 GEMM) is
    ~36% of the v5e spec sheet (197 TF/s bf16); this scans whether any
    shape/precision gets closer — if so, every '% of peak' claim rescales.
    """
    shapes = [
        ("bf16 4096^3", (4096, 4096, 4096), jnp.bfloat16, None),
        ("bf16 8192x4096x4096", (8192, 4096, 4096), jnp.bfloat16, None),
        ("bf16 16384x8192x2048", (16384, 8192, 2048), jnp.bfloat16, None),
        ("bf16 8192^3", (8192, 8192, 8192), jnp.bfloat16, None),
        ("bf16->bf16out 8192^3", (8192, 8192, 8192), jnp.bfloat16, "bf16out"),
        ("f32 4096^3", (4096, 4096, 4096), jnp.float32, None),
        ("int8 8192^3", (8192, 8192, 8192), jnp.int8, None),
    ]
    for name, (m, k, n), dt, variant in shapes:
        def fn(p, key, m=m, k=k, n=n, dt=dt, variant=variant):
            if dt == jnp.int8:
                a = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
                b = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
                c = jax.lax.dot(a, b, preferred_element_type=jnp.int32)
                return jnp.sum(c.astype(jnp.float32))
            a = jax.random.normal(key, (m, k), dt)
            b = jax.random.normal(key, (k, n), dt)
            if variant == "bf16out":
                c = jax.lax.dot(a, b, preferred_element_type=jnp.bfloat16)
            else:
                c = jax.lax.dot(a, b)
            return jnp.sum(c.astype(jnp.float32))

        try:
            dt_s = slope_time(fn, ())
            tf = 2 * m * k * n / dt_s / 1e12
            print(f"peak {name}: {dt_s*1000:.2f} ms -> {tf:.1f} TF/s",
                  flush=True)
        except Exception as e:  # OOM on big shapes: report, keep scanning
            print(f"peak {name}: failed ({type(e).__name__})", flush=True)


def probe_train_parts():
    """fwd vs fwd+bwd per part, train-path settings (B=32, full shapes).

    The train step measures bwd ~2.8x fwd while an ideal bwd (dgrad + wgrad,
    each ~one fwd) is 2x — this locates the ~78 ms excess.
    """
    from peppa_tpu.models.video3d import VideoResNetTrunk
    from peppa_tpu.models.wav2vec2 import (ConvFeatureExtractor,
                                           ConvPositionalEmbedding,
                                           TransformerLayer, Wav2Vec2Config)

    S = 101430
    T = 316
    cfg = Wav2Vec2Config()
    dt16 = jnp.bfloat16

    def measure(name, mod, make_x, apply_fn, init_call=None):
        init_call = init_call or (lambda m, rng, x: m.init(rng, x))
        params = jax.jit(lambda rng, x: init_call(mod, rng, x))(
            jax.random.PRNGKey(0), make_x(1))

        def fwd(p, key):
            x = jax.random.normal(key, make_x(B).shape, jnp.float32) * 0.1
            return jnp.sum(apply_fn(mod, p, x).astype(jnp.float32))

        def fwdbwd(p, key):
            x = jax.random.normal(key, make_x(B).shape, jnp.float32) * 0.1

            def loss(pp):
                return jnp.sum(apply_fn(mod, pp, x).astype(jnp.float32) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            return l + sum(jnp.sum(leaf.astype(jnp.float32))
                           for leaf in jax.tree_util.tree_leaves(g))

        f = slope_time(fwd, params)
        fb = slope_time(fwdbwd, params)
        print(f"{name}: fwd {f*1000:.1f} ms  fwd+bwd {fb*1000:.1f} ms  "
              f"bwd/fwd {(fb-f)/f:.2f}x", flush=True)

    measure("conv_extractor", ConvFeatureExtractor(dt16),
            lambda b: jnp.zeros((b, S)),
            lambda m, p, x: m.apply(p, x))
    measure("pos_conv", ConvPositionalEmbedding(cfg, dt16),
            lambda b: jnp.zeros((b, T, cfg.embed_dim)),
            lambda m, p, x: m.apply(p, x))
    measure("transformer_layer(xla-attn)", TransformerLayer(cfg, dt16,
                                                            use_pallas=False),
            lambda b: jnp.zeros((b, T, cfg.embed_dim)),
            lambda m, p, x: m.apply(p, x, None, True),
            lambda m, rng, x: m.init(rng, x, None, True))
    measure("video_trunk_mid128", VideoResNetTrunk(
        "r2plus1d_18", dt16, jnp.float32, midplanes_multiple=128),
        lambda b: jnp.zeros((b, 23, 100, 180, 3)),
        lambda m, p, x: m.apply(p, x, True, mutable=["batch_stats"])[0])


def probe_stem_s2d():
    """Stem spatial conv: native (1,7,7)s(1,2,2) 3ch vs space-to-depth form.

    The stem reads 3 input channels, so the MXU contraction dim is
    7*7*3 = 147 (pads to 256, 57% lane use).  Space-to-depth(2x2) re-lays
    the input as (50, 90, 12) and the stride-2 7-tap kernel becomes a
    stride-1 4-tap kernel over 12 channels: contraction 4*4*12 = 192
    (75% of 256).  An exact weight re-layout exists (zero-pad 7->8 taps,
    fold the stride-2 phase into channels), so if this measures a real win
    the trunk can adopt it without changing the math.
    """
    frames, h, w = 23, 100, 180

    def native(key):
        x = jax.random.uniform(key, (B, frames, h, w, 3), jnp.bfloat16)
        wgt = jax.random.normal(jax.random.PRNGKey(7), (1, 7, 7, 3, 45),
                                jnp.bfloat16) * 0.05
        y = jax.lax.conv_general_dilated(
            x, wgt, window_strides=(1, 2, 2), padding=[(0, 0), (3, 3), (3, 3)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y.astype(jnp.float32))

    def s2d(key):
        x = jax.random.uniform(key, (B, frames, h, w, 3), jnp.bfloat16)
        xs = x.reshape(B, frames, h // 2, 2, w // 2, 2, 3)
        xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(
            B, frames, h // 2, w // 2, 12)
        wgt = jax.random.normal(jax.random.PRNGKey(7), (1, 4, 4, 12, 45),
                                jnp.bfloat16) * 0.05
        y = jax.lax.conv_general_dilated(
            xs, wgt, window_strides=(1, 1, 1),
            padding=[(0, 0), (1, 2), (1, 2)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
        return jnp.sum(y.astype(jnp.float32))

    for name, fn in (("native_177", native), ("s2d_144", s2d)):
        dt = slope_time(lambda p, key, f=fn: f(key), ())
        print(f"stem {name}: {dt*1000:.2f} ms/batch", flush=True)


def probe_peak_chained():
    """GEMM peak WITHOUT per-iteration RNG: x_{i+1} = rescale(x_i @ W).

    probe_peak generates fresh random operands INSIDE each timed iteration —
    at 8192x4096x4096 that is ~50M normal samples (threefry + erf-inv on the
    VPU) per GEMM, potentially comparable to the ~1.4 ms the MXU needs for
    the GEMM itself at spec, which would understate the bf16 peak and is the
    prime suspect for the round-2 calibration anomaly (bf16 at 36% of the
    197 TF/s v5e spec while int8 slope-measured ABOVE its 394 TOPS spec).

    Here the only per-iteration work is the GEMM plus an O(m*k) rescale
    (vs the GEMM's O(m*k*n)): the carried activation is renormalized by a
    scalar so the chain stays finite, and every iteration's input is distinct
    (relay dedup defeated by the data dependence itself).  W is drawn once
    OUTSIDE the scan.  Ratio of chained to rng-in-loop time isolates the
    pollution; rng cost is also measured directly (probe_rng_cost).
    """
    shapes = [
        ("bf16 4096^3", (4096, 4096, 4096), jnp.bfloat16),
        ("bf16 8192x4096x4096", (8192, 4096, 4096), jnp.bfloat16),
        ("bf16 8192^3", (8192, 8192, 8192), jnp.bfloat16),
        ("bf16 16384x8192x8192", (16384, 8192, 8192), jnp.bfloat16),
        ("f32 4096^3", (4096, 4096, 4096), jnp.float32),
        ("int8->int32 8192^3", (8192, 8192, 8192), jnp.int8),
    ]
    for name, (m, k, n), dt in shapes:
        if k != n:
            continue  # chaining needs square W

        def make_chain(m=m, k=k, dt=dt):
            @functools.partial(jax.jit, static_argnames=("iters",))
            def chain(seed, iters):
                key_x, key_w = jax.random.split(jax.random.PRNGKey(seed))
                if dt == jnp.int8:
                    x0 = jax.random.randint(key_x, (m, k), -127, 127, jnp.int8)
                    w = jax.random.randint(key_w, (k, k), -2, 3, jnp.int8)

                    def body(x, _):
                        y = jax.lax.dot(x, w,
                                        preferred_element_type=jnp.int32)
                        # fold back into int8 range, data-dependently
                        return (y % 251 - 125).astype(jnp.int8), None
                else:
                    x0 = jax.random.normal(key_x, (m, k), dt)
                    # spectral radius ~2*0.5=1: the chain neither explodes nor
                    # vanishes over the few iterations timed, so the body is
                    # the bare GEMM — zero extra passes over the data
                    w = (jax.random.normal(key_w, (k, k), dt)
                         * (0.5 / np.sqrt(k))).astype(dt)

                    def body(x, _):
                        return jax.lax.dot(x, w), None

                xk, _ = jax.lax.scan(body, x0, None, length=iters)
                return jnp.sum(xk.astype(jnp.float32))

            return chain

        chain = make_chain()

        def timed(seed, iters):
            t0 = time.perf_counter()
            v = float(np.asarray(chain(seed, iters)))
            assert np.isfinite(v) or dt == jnp.int8
            return time.perf_counter() - t0

        try:
            k_small, k_large = 4, 12
            timed(0, k_small)
            timed(0, k_large)
            # slope between two iteration counts cancels dispatch AND the
            # one-time x0/W generation
            per = min((timed(1 + r, k_large) - timed(101 + r, k_small))
                      / (k_large - k_small) for r in range(2))
            tf = 2 * m * k * n / per / 1e12
            print(f"chained {name}: {per*1000:.2f} ms -> {tf:.1f} TF/s",
                  flush=True)
        except Exception as e:
            print(f"chained {name}: failed ({type(e).__name__}: {e})",
                  flush=True)


# Every timed() call across the WHOLE process gets a globally unique input
# perturbation: reusing ANY previous input value lets the relay serve a
# cached result (measured as instant returns -> negative slopes).  The
# mantissa steps are units of 2^-7 — exactly representable in bf16 (7
# mantissa bits), so the perturbed product differs from x0 in bf16 as well
# as f32; a 1e-6 nudge would round to exactly 1.0 * x0 in bf16 and defeat
# nothing.  Once the 96 mantissa steps are exhausted the exponent varies
# too (also bf16-exact), giving 96*13 unique scales; the assert fires
# before any scale could repeat.
_SCALE_COUNTER = [0]


def _unique_scale() -> np.float32:
    _SCALE_COUNTER[0] += 1
    c = _SCALE_COUNTER[0]
    assert c < 96 * 13, "unique-scale space exhausted; widen the exponent range"
    mant = 1.0 + ((c % 96) + 1) * 2.0 ** -7
    return np.float32(mant * 2.0 ** ((c // 96 + 6) % 13 - 6))


def chained_time(step_fn, x0, n_rep=5, min_signal_s=1.0):
    """Time a shape-preserving step via the data-dependent chain method.

    step_fn(x) -> x' (same shape/dtype).  The chain defeats relay result
    caching without per-iteration RNG, so the measurement is the step alone.
    Returns seconds per step from the slope between two chain lengths; the
    lengths are auto-calibrated so the slope signal is >= min_signal_s —
    sub-ms steps need hundreds of iterations to rise above the tunnel's
    dispatch jitter (a fixed small k produced NEGATIVE times for cheap ops).
    """
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(x, iters):
        def body(i, x):
            y = step_fn(x)
            # renormalize so hundreds of applications of a non-contractive
            # part neither blow up nor underflow; same O(numel) cost for
            # every variant compared, so comparisons are unaffected
            scale = jax.lax.rsqrt(
                jnp.mean(jnp.square(y.astype(jnp.float32))) + 1e-12)
            return (y.astype(jnp.float32) * scale).astype(y.dtype)

        xk = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(xk.astype(jnp.float32))

    def timed(iters):
        x = x0 * _unique_scale()
        x = x.astype(x0.dtype)
        t0 = time.perf_counter()
        v = float(np.asarray(chain(x, iters)))
        assert np.isfinite(v), f"chain diverged: {v}"
        return time.perf_counter() - t0

    # pilot: estimate per-step cost, then size the chain lengths so the
    # slope signal dwarfs the tunnel's dispatch jitter (observed at
    # ~0.1-0.3 s occasionally — a 0.15 s signal produced NEGATIVE slopes)
    k_small = 4
    timed(k_small)  # compile k_small
    pilot = max(min(timed(64) - timed(k_small) for _ in range(2)) / 60, 2e-6)
    k_large = k_small + int(np.clip(np.ceil(min_signal_s / pilot), 64, 8192))
    timed(k_large)  # compile k_large
    slopes = sorted((timed(k_large) - timed(k_small)) / (k_large - k_small)
                    for _ in range(max(n_rep, 3)))
    return slopes[len(slopes) // 2]  # median: robust to dispatch jitter


def probe_layer_parts():
    """RNG-free decomposition of the wav2vec2 transformer layer (B=32, T=317).

    Round-3 calibration (probe_peak_chained) puts the true bf16 practical
    peak at ~180 TF/s — 2.5x the round-2 number — which re-opens the
    question this probe answers: the layer measures ~2.0 ms RNG-free versus
    0.85 ms ideal; where do the extra milliseconds sit?  Each part is timed
    by the chain method (x -> part -> renorm -> x), so no RNG pollutes the
    slope and relay caching is defeated by the data dependence.
    """
    from peppa_tpu.models.wav2vec2 import (SelfAttention, TransformerLayer,
                                           Wav2Vec2Config, gelu)

    T = 317
    cfg = Wav2Vec2Config()
    d, f = cfg.embed_dim, cfg.ffn_dim
    dt16 = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T, d)), dt16)

    # matmul FLOPs per layer: QKVO + FFN denses + the two attention einsums
    layer_flops = 2 * B * T * (4 * d * d + 2 * d * f) + 4 * B * T * T * d

    # --- full layer, pallas vs xla attention (eval path, deterministic)
    for name, use_pallas in (("layer pallas", True), ("layer xla", False)):
        layer = TransformerLayer(cfg, dt16, use_pallas=use_pallas)
        params = layer.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, T, d)), None, True)
        step = lambda x, layer=layer, params=params: layer.apply(
            params, x, None, True).astype(dt16)
        per = chained_time(step, x0)
        print(f"{name}: {per*1000:.3f} ms -> {layer_flops/per/1e12:.1f} TF/s",
              flush=True)

    # --- attention block alone (4 projections + fused attention)
    for name, use_pallas in (("attn-block pallas", True),
                             ("attn-block xla", False)):
        att = SelfAttention(cfg, dt16, use_pallas=use_pallas)
        params = att.init(jax.random.PRNGKey(0), jnp.zeros((1, T, d)), None,
                          True)
        step = lambda x, att=att, params=params: att.apply(
            params, x, None, True).astype(dt16)
        per = chained_time(step, x0)
        print(f"{name}: {per*1000:.3f} ms", flush=True)

    # --- FFN-shaped GEMM pair: (B*T,768)@(768,3072)@(3072,768)
    m = B * T
    w1 = jnp.asarray(rng.standard_normal((d, f)) * (0.5 / np.sqrt(d)), dt16)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * (0.5 / np.sqrt(f)), dt16)
    x2 = jnp.asarray(rng.standard_normal((m, d)), dt16)
    step = lambda x: jax.lax.dot(jax.lax.dot(x, w1), w2)
    per = chained_time(step, x2)
    tf = 2 * m * d * f * 2 / per / 1e12
    print(f"ffn gemm pair (m={m}): {per*1000:.3f} ms -> {tf:.1f} TF/s",
          flush=True)

    # --- FFN pair with exact-GELU epilogue (the real FFN)
    step = lambda x: jax.lax.dot(gelu(jax.lax.dot(x, w1)), w2)
    per = chained_time(step, x2)
    print(f"ffn gemm pair + gelu: {per*1000:.3f} ms", flush=True)

    # --- QKVO-shaped square GEMM chain: (B*T,768)@(768,768)
    w3 = jnp.asarray(rng.standard_normal((d, d)) * (0.5 / np.sqrt(d)), dt16)
    step = lambda x: jax.lax.dot(x, w3)
    per = chained_time(step, x2)
    tf = 2 * m * d * d / per / 1e12
    print(f"qkvo gemm (m={m}): {per*1000:.3f} ms -> {tf:.1f} TF/s", flush=True)

    # --- 3 separate QKV dots vs one fused (768 -> 2304) GEMM
    wq, wk, wv = (jnp.asarray(rng.standard_normal((d, d)) * 0.02, dt16)
                  for _ in range(3))
    step = lambda x: ((jax.lax.dot(x, wq) + jax.lax.dot(x, wk)
                       + jax.lax.dot(x, wv)) / 3).astype(dt16)
    per3 = chained_time(step, x2)
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)
    step = lambda x: (jax.lax.dot(x, wqkv).reshape(m, 3, d).mean(axis=1)
                      ).astype(dt16)
    perf_ = chained_time(step, x2)
    print(f"qkv 3 dots: {per3*1000:.3f} ms; fused 768->2304: "
          f"{perf_*1000:.3f} ms", flush=True)

    # --- attention core alone (no projections): q=k=v from the carried x
    from peppa_tpu.ops.pallas.attention import mha_attention
    h, hd = cfg.num_heads, d // cfg.num_heads

    def core_pallas(x):
        q = x.reshape(B, T, h, hd)
        return mha_attention(q, q, q, lengths=None,
                             scale=hd ** -0.5).reshape(B, T, d).astype(dt16)

    def core_xla(x):
        q = x.reshape(B, T, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, q,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1).astype(dt16)
        return jnp.einsum("bhqk,bkhd->bqhd", probs, q).reshape(B, T, d)

    for name, core in (("attn-core pallas", core_pallas),
                       ("attn-core xla", core_xla)):
        per = chained_time(core, x0)
        print(f"{name}: {per*1000:.3f} ms", flush=True)

    # --- attention core at longer T: where is the pallas/xla crossover?
    for t2 in (640, 1280):
        x4 = jnp.asarray(rng.standard_normal((8, t2, d)), dt16)

        def core_pallas2(x, t2=t2):
            q = x.reshape(8, t2, h, hd)
            return mha_attention(q, q, q, lengths=None,
                                 scale=hd ** -0.5).reshape(8, t2, d) \
                .astype(dt16)

        def core_xla2(x, t2=t2):
            q = x.reshape(8, t2, h, hd)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q * hd ** -0.5, q,
                                preferred_element_type=jnp.float32)
            probs = jax.nn.softmax(logits, axis=-1).astype(dt16)
            return jnp.einsum("bhqk,bkhd->bqhd", probs, q).reshape(8, t2, d)

        for name, core in ((f"attn-core T={t2} pallas", core_pallas2),
                           (f"attn-core T={t2} xla", core_xla2)):
            per = chained_time(core, x4)
            print(f"{name}: {per*1000:.3f} ms", flush=True)

    # --- LayerNorm f32 (current) vs bf16 compute on (B,T,768)
    import flax.linen as nn
    for name, ln_dt in (("ln f32", jnp.float32), ("ln bf16", dt16)):
        ln = nn.LayerNorm(epsilon=1e-5, dtype=ln_dt)
        params = ln.init(jax.random.PRNGKey(0), jnp.zeros((1, T, d)))
        step = lambda x, ln=ln, params=params: ln.apply(params, x).astype(dt16)
        per = chained_time(step, x0)
        print(f"{name}: {per*1000:.3f} ms", flush=True)

    # --- GELU alone on the (B,T,3072) intermediate
    x3 = jnp.asarray(rng.standard_normal((B, T, f)) * 0.1, dt16)
    per = chained_time(lambda x: gelu(x), x3)
    print(f"gelu (B,T,3072): {per*1000:.3f} ms", flush=True)


def probe_tails():
    """The unaccounted tail between the summed part probes (~86 ms at B=32)
    and the whole-model step (~98 ms): input normalization, feature
    projection, aux head, poolers, output projections, L2 norms, scoring.

    Each piece is measured with the slope method; the per-iteration RNG that
    generates its input is measured separately (rng-only baseline, identical
    shapes) and subtracted, so the printed number is the piece alone.
    Run at B=32 (matches the part probes) and B=256 (the bench batch).
    """
    import flax.linen as nn

    from peppa_tpu.models.layers import AttentionPool, VideoAttentionPool
    from peppa_tpu.ops.loss import triplet_loss
    from peppa_tpu.ops.metrics import recall_at_n
    from peppa_tpu.ops.similarity import l2_normalize

    T, D = 316, 768
    dt16 = jnp.bfloat16

    def part(name, b, shapes_dtypes, apply, init_input=None, module=None):
        """Measure apply(params, *inputs) minus the rng cost of its inputs."""
        params = ()
        if module is not None:
            params = jax.jit(module.init)(jax.random.PRNGKey(0), *init_input)

        def gen(key):
            xs = []
            for i, (s, dt, kind) in enumerate(shapes_dtypes):
                k = jax.random.fold_in(key, i)
                if kind == "u8":
                    xs.append(jax.random.randint(k, s, 0, 256, jnp.uint8))
                else:
                    xs.append(jax.random.normal(k, s, jnp.float32)
                              .astype(dt) * jnp.asarray(0.1, dt))
            return xs

        def fn(p, key):
            return jnp.sum(apply(p, *gen(key)).astype(jnp.float32))

        def rng_only(p, key):
            return sum(jnp.sum(x.astype(jnp.float32)) for x in gen(key))

        t_all = slope_time(fn, params, n_rep=3)
        t_rng = slope_time(rng_only, (), n_rep=3)
        net = (t_all - t_rng) * 1000
        print(f"B={b:<4} {name}: {net:.3f} ms (raw {t_all*1000:.3f}, "
              f"rng {t_rng*1000:.3f})", flush=True)
        return net

    for b in (32, 256):
        total = 0.0
        # 1. video input normalization: uint8 -> f32/255 -> channel norm -> bf16
        mean = jnp.asarray((0.43216, 0.394666, 0.37645), jnp.float32)
        std = jnp.asarray((0.22803, 0.22145, 0.216989), jnp.float32)
        total += part(
            "video_input_norm", b,
            [((b, 23, 100, 180, 3), jnp.uint8, "u8")],
            lambda p, v: ((v.astype(jnp.float32) / 255.0 - mean) / std
                          ).astype(dt16))
        # 2. feature projection: LayerNorm(512) f32 + Dense(512->768)
        class FeatProj(nn.Module):
            @nn.compact
            def __call__(self, x):
                x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                 name="ln")(x)
                return nn.Dense(D, dtype=dt16, name="proj")(x)
        fp = FeatProj()
        total += part("feature_projection", b, [((b, T, 512), dt16, "n")],
                      lambda p, x: fp.apply(p, x),
                      init_input=(jnp.zeros((1, T, 512), dt16),), module=fp)
        # 3. encoder_ln: LayerNorm(768) f32 on (B,T,768)
        class EncLN(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                    name="ln")(x)
        eln = EncLN()
        total += part("encoder_ln", b, [((b, T, D), dt16, "n")],
                      lambda p, x: eln.apply(p, x),
                      init_input=(jnp.zeros((1, T, D), dt16),), module=eln)
        # 4. aux head Dense(768->28)
        class Aux(nn.Module):
            @nn.compact
            def __call__(self, x):
                return nn.Dense(28, dtype=dt16, name="aux")(x)
        aux = Aux()
        total += part("aux_head", b, [((b, T, D), dt16, "n")],
                      lambda p, x: aux.apply(p, x),
                      init_input=(jnp.zeros((1, T, D), dt16),), module=aux)
        # 5. audio attention pool on the 28-d logits
        ap = AttentionPool(128)
        total += part("audio_attn_pool(28d)", b, [((b, T, 28), dt16, "n")],
                      lambda p, x: ap.apply(p, x),
                      init_input=(jnp.zeros((1, T, 28), dt16),), module=ap)
        # 6. audio project Dense(28->512) + l2norm
        class AProj(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = nn.Dense(512, dtype=dt16, name="project")(x)
                return l2_normalize(y.astype(jnp.float32), axis=1)
        apj = AProj()
        total += part("audio_project+l2", b, [((b, 28), dt16, "n")],
                      lambda p, x: apj.apply(p, x),
                      init_input=(jnp.zeros((1, 28), dt16),), module=apj)
        # 7. video pool: spatial mean + temporal attention on trunk output
        vp = VideoAttentionPool(128)
        total += part("video_attn_pool", b, [((b, 3, 7, 12, 512), dt16, "n")],
                      lambda p, x: vp.apply(p, x),
                      init_input=(jnp.zeros((1, 3, 7, 12, 512), dt16),),
                      module=vp)
        # 8. video project Dense(512->512) + l2norm
        class VProj(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = nn.Dense(512, dtype=dt16, name="project")(x)
                return l2_normalize(y.astype(jnp.float32), axis=1)
        vpj = VProj()
        total += part("video_project+l2", b, [((b, 512), dt16, "n")],
                      lambda p, x: vpj.apply(p, x),
                      init_input=(jnp.zeros((1, 512), dt16),), module=vpj)
        # 9. scoring: triplet loss + recall@10 on the embeddings
        eye = jnp.eye(b)
        total += part(
            "score(loss+recall)", b,
            [((b, 512), jnp.float32, "n"), ((b, 512), jnp.float32, "n")],
            lambda p, v, a: (triplet_loss(v, a, margin=0.2)
                             + jnp.sum(recall_at_n(v, a, eye, n=10))
                             ).reshape(1))
        print(f"B={b:<4} TOTAL tails: {total:.2f} ms", flush=True)


def probe_train_macro():
    """Macro-batch study (VERDICT r3 #4): the recipe's effective batch is 64
    (hparams_base.yaml batch_size=8 x accumulate_grad_batches=8).  Measure
    the real train step (fwd+bwd+BertAdam, dropout on, global-negative loss)
    per EFFECTIVE 64-clip optimizer step for:

      - fused B=64, accumulate=1
      - 2 x B=32, accumulate=2 (MultiSteps)
      - 8 x B=8,  accumulate=8 (MultiSteps, the reference recipe)
      - fused B=64 with remat towers (only relevant if plain B=64 OOMs)

    All four are recipe-equivalent (use_grad_mean=True averages micro-grads);
    the winner becomes the production default.
    """
    from peppa_tpu.config import default_config
    from peppa_tpu.data.types import ClipBatch
    from peppa_tpu.models.dual_encoder import init_model
    from peppa_tpu.training.optimization import make_optimizer
    from peppa_tpu.training.state import TrainState
    from peppa_tpu.training.step import make_train_step

    frames, samples = 23, 101430

    def measure(label, b, acc, remat):
        cfg = default_config()
        cfg.training.precision = "bf16"
        cfg.video.midplanes_multiple = 128
        if remat:
            cfg.tpu.remat_audio = cfg.tpu.remat_video = True
        model, variables = init_model(cfg, jax.random.PRNGKey(0),
                                      audio_samples=samples,
                                      video_frames=frames)
        tx = make_optimizer(cfg.optimizer, accumulate_grad_batches=acc)
        state = TrainState.create(variables, tx)
        train_step = make_train_step(model, cfg.margin)

        def make_batch(key):
            kv, ka = jax.random.split(key)
            video = jax.random.randint(kv, (b, frames, 100, 180, 3), 0, 256,
                                       jnp.uint8)
            audio = jax.random.normal(ka, (b, samples), jnp.float32) * 0.1
            return ClipBatch(
                video=video, audio=audio,
                video_duration=jnp.full((b,), 2.3),
                audio_duration=jnp.full((b,), 2.3),
                video_frames=jnp.full((b,), frames, jnp.int32),
                audio_samples=jnp.full((b,), samples, jnp.int32))

        @functools.partial(jax.jit, static_argnames=("k",))
        def run_k(st, seed, k):
            keys = jax.random.split(jax.random.PRNGKey(seed), k)

            def body(st, key):
                st2, metrics = train_step(st, make_batch(key), key)
                return st2, metrics["train_loss"]

            st, losses = jax.lax.scan(body, st, keys)
            return jnp.sum(losses)

        @jax.jit
        def trivial(seed):
            return jnp.sum(jax.random.normal(jax.random.PRNGKey(seed), (8, 8)))

        def timed(seed, k):
            t0 = time.perf_counter()
            v = float(np.asarray(run_k(state, seed, k)))
            assert np.isfinite(v)
            return time.perf_counter() - t0

        def timed_trivial(seed):
            t0 = time.perf_counter()
            float(np.asarray(trivial(seed)))
            return time.perf_counter() - t0

        k = max(K // max(acc // 2, 1), 2)  # keep wall time comparable
        try:
            timed_trivial(0)
            timed(0, k)
        except Exception as e:
            print(f"{label}: FAILED ({type(e).__name__}: {str(e)[:160]})",
                  flush=True)
            return None
        overhead = min(timed_trivial(i) for i in range(1, 6))
        per_micro = min(max(timed(1 + r, k) - overhead, 1e-9) / k
                        for r in range(2))
        per_eff = per_micro * acc
        print(f"{label}: {per_micro*1000:.1f} ms/micro-step x {acc} = "
              f"{per_eff*1000:.1f} ms per effective-64 step "
              f"({64.0/per_eff:.1f} clips/s)", flush=True)
        return per_eff

    variants = {
        "fused64": ("fused B=64 acc=1", 64, 1, False),
        "b32": ("2 x B=32 acc=2", 32, 2, False),
        "b16": ("4 x B=16 acc=4", 16, 4, False),
        "b8": ("8 x B=8  acc=8 (reference recipe)", 8, 8, False),
        "remat64": ("fused B=64 acc=1 remat", 64, 1, True),
    }
    only = os.environ.get("TRAIN_MACRO_ONLY")
    for key, args in variants.items():
        if only and key not in only.split(","):
            continue
        measure(*args)


def probe_rng_cost():
    """Direct cost of the per-iteration RNG that probe_peak folds into its
    GEMM timings: generate the same operand volumes, no matmul."""
    cases = [
        ("normal bf16 8192x4096 + 4096x4096", [(8192, 4096), (4096, 4096)],
         "normal", jnp.bfloat16),
        ("normal bf16 2x 8192x8192", [(8192, 8192), (8192, 8192)],
         "normal", jnp.bfloat16),
        ("randint int8 2x 8192x8192", [(8192, 8192), (8192, 8192)],
         "randint", jnp.int8),
        ("normal f32 2x 4096x4096", [(4096, 4096), (4096, 4096)],
         "normal", jnp.float32),
        # the model probes' per-iteration input volumes: how much of each
        # part measurement is RNG, not the part?
        ("uniform f32 video batch (32,23,100,180,3)",
         [(32, 23, 100, 180, 3)], "uniform", jnp.float32),
        ("normal f32 audio batch (32,101430)",
         [(32, 101430)], "normal", jnp.float32),
        ("normal f32 transformer input (32,317,768)",
         [(32, 317, 768)], "normal", jnp.float32),
    ]
    for name, shapes, kind, dt in cases:
        def fn(p, key, shapes=shapes, kind=kind, dt=dt):
            acc = jnp.zeros((), jnp.float32)
            for i, s in enumerate(shapes):
                k = jax.random.fold_in(key, i)
                if kind == "randint":
                    x = jax.random.randint(k, s, -127, 127, dt)
                elif kind == "uniform":
                    x = jax.random.uniform(k, s, dt)
                else:
                    x = jax.random.normal(k, s, dt)
                acc = acc + jnp.sum(x.astype(jnp.float32))
            return acc

        dt_s = slope_time(fn, ())
        print(f"rng {name}: {dt_s*1000:.2f} ms", flush=True)


def probe_loader_threads():
    """Native loader assembly rate vs worker-pool size (VERDICT r4 #8).

    Pure host-side: pack -> C++ pool -> padded ClipBatch, no device in the
    loop.  On this 1-core host the AGGREGATE rate cannot exceed one core's
    throughput; what the sweep bounds is the pool's own overhead — if the
    rate holds ~flat under 2/4/8 oversubscribed threads there is no lock
    contention or false sharing eating the budget, so the PERF.md
    projection (real host: rate scales with cores until PCIe) rests on
    measured pool behavior, not assumption.
    """
    import json

    from bench import _build_bench_pack
    from peppa_tpu.native.loader import NativeBatchLoader, NativePack

    frames, samples = 23, 101430
    b, n_items = 32, 96
    pack_path = f"/tmp/peppa_loader_scaling_{frames}x{samples}.ppkc"
    if not os.path.exists(pack_path):
        _build_bench_pack(pack_path, n_items, frames, samples)
    pack = NativePack(pack_path)
    pad = (frames, 100, 180, 3, samples)
    rng = np.random.default_rng(7)
    plan = []
    for _ in range(400):
        order = rng.permutation(n_items)
        for lo in range(0, n_items - b + 1, b):
            plan.append((order[lo:lo + b].tolist(), pad))
    bytes_per_pair = (frames * 100 * 180 * 3
                      + samples * np.dtype(pack.audio_dtype).itemsize)

    results = {}
    for nt in (1, 2, 4, 8):
        loader = NativeBatchLoader(pack, plan, n_threads=nt, depth=4)
        try:
            it = iter(loader)
            for _ in range(4):  # warm the pool + page cache
                next(it)
            t0 = time.perf_counter()
            k = 0
            while time.perf_counter() - t0 < 8.0:
                if next(it, None) is None:
                    break
                k += 1
            dt = time.perf_counter() - t0
        finally:
            loader.close()
        pairs_s = k * b / dt
        results[nt] = round(pairs_s, 1)
        print(f"n_threads={nt}: {pairs_s:7.1f} pairs/s "
              f"({pairs_s * bytes_per_pair / 1e6:6.1f} MB/s, "
              f"{k} batches in {dt:.1f} s)", flush=True)
    pack.close()
    base = results[1]
    print(json.dumps({"probe": "loader_threads", "pairs_per_sec": results,
                      "worst_vs_1thread": round(min(results.values()) / base, 3)
                      if base else None}))


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "video"
    if what == "video":
        probe_video()
    elif what == "video2d":
        probe_video_decomposed()
    elif what == "audio":
        probe_audio()
    elif what == "audio_parts":
        probe_audio_parts()
    elif what == "video_mid128":
        probe_video_mid128()
    elif what == "stem_s2d":
        probe_stem_s2d()
    elif what == "train_parts":
        probe_train_parts()
    elif what == "peak":
        probe_peak()
    elif what == "peak_chained":
        probe_peak_chained()
    elif what == "rng_cost":
        probe_rng_cost()
    elif what == "tails":
        probe_tails()
    elif what == "loader_threads":
        probe_loader_threads()
    elif what == "train_macro":
        probe_train_macro()
    elif what == "layer_parts":
        probe_layer_parts()
