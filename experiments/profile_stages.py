"""Per-stage timing + FLOP accounting for the 1080p P-frame forward.

Times each jitted stage of the 'performance' DMC at 1080p in bf16 and prints
a table of ms, GFLOP (XLA cost analysis), and achieved TFLOP/s, plus the
whole-frame numbers. Use this to pick Pallas/fusion targets.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from ssgvc_tpu.config import DMCConfig
from ssgvc_tpu.models.dmc import DMC


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile()
        an = c.cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return an.get("flops", 0.0)
    except Exception as e:  # noqa: BLE001
        print("  cost_analysis failed:", e)
        return 0.0


def main():
    cfg = DMCConfig.variant("performance", dtype="bfloat16")
    model = DMC(cfg)
    b, h, w = 1, 1088, 1920
    key = jax.random.PRNGKey(0)
    frame = jax.random.uniform(key, (b, h, w, 3), jnp.bfloat16)
    mask = (jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, 1)) > 0.8
            ).astype(jnp.bfloat16)
    dpb = {
        "frame": jax.random.uniform(jax.random.PRNGKey(2), (b, h, w, 3),
                                    jnp.bfloat16),
        "feature": jax.random.normal(jax.random.PRNGKey(3),
                                     (b, h // 8, w // 8, cfg.ch_d),
                                     jnp.bfloat16) * 0.1,
    }
    qp = jnp.int32(32)
    params = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)), qp,
                        {"frame": jnp.zeros((1, 64, 64, 3)),
                         "feature": jnp.zeros((1, 8, 8, cfg.ch_d))},
                        after_i=False, mask=jnp.zeros((1, 64, 64, 1)),
                        train=False)["params"]

    # ---- whole forward -----------------------------------------------------
    @jax.jit
    def full(params, frame, mask, qp, dpb):
        return model.apply({"params": params}, frame, qp, dpb,
                           after_i=False, mask=mask, train=False)

    t, out = timeit(full, params, frame, mask, qp, dpb)
    fl = flops_of(lambda p, f, m, q, d: full(p, f, m, q, d),
                  params, frame, mask, qp, dpb)
    print(f"FULL P-frame fwd: {t*1e3:8.2f} ms  {fl/1e9:8.1f} GFLOP  "
          f"{fl/t/1e12:6.2f} TFLOP/s  ({1/t:.1f} fps)")

    # ---- stages ------------------------------------------------------------
    def bound(method_name):
        def f(params, *args):
            return model.apply({"params": params}, *args, method=method_name)
        return jax.jit(f)

    # stage inputs
    feat = dpb["feature"]
    q_vec = jnp.ones((1, 1, 1, cfg.ch_d), jnp.bfloat16)

    stages = []

    # feature_adaptor_p + feature_extractor
    def s_fe(params, feat, q):
        def go(m):
            f = m.feature_adaptor_p(feat)
            return m.feature_extractor(f, q)
        return model.apply({"params": params}, method=go)
    s_fe = jax.jit(s_fe)
    t_fe, (ctx, ctx_t) = timeit(s_fe, params, feat, q_vec)
    stages.append(("feature_extractor", t_fe,
                   flops_of(lambda p, f, q: s_fe(p, f, q), params, feat, q_vec)))

    # encoder
    def s_enc(params, x, ctx, q):
        return model.apply({"params": params},
                           method=lambda m: m.encoder(x, ctx, q))
    s_enc = jax.jit(s_enc)
    t_enc, y = timeit(s_enc, params, frame, ctx, q_vec)
    stages.append(("encoder", t_enc,
                   flops_of(lambda p, x, c, q: s_enc(p, x, c, q),
                            params, frame, ctx, q_vec)))

    # SFT
    q_sft = jnp.ones((1, 1, 1, cfg.ch_d), jnp.bfloat16)

    def s_sft(params, mask, q):
        return model.apply({"params": params},
                           method=lambda m: m.mask_sft(mask, q))
    s_sft = jax.jit(s_sft)
    t_sft, gb = timeit(s_sft, params, mask, q_sft)
    stages.append(("mask_sft", t_sft,
                   flops_of(lambda p, mk, q: s_sft(p, mk, q),
                            params, mask, q_sft)))

    # hyper encoder
    def s_he(params, y):
        return model.apply({"params": params},
                           method=lambda m: m.hyper_encoder(y))
    s_he = jax.jit(s_he)
    t_he, z = timeit(s_he, params, y)
    stages.append(("hyper_encoder", t_he,
                   flops_of(lambda p, y: s_he(p, y), params, y)))

    # prior params (hyper_decoder + temporal prior + fusion)
    def s_pp(params, z, ctx_t):
        return model.apply(
            {"params": params},
            method=lambda m: m.res_prior_param_decoder(z, ctx_t))
    s_pp = jax.jit(s_pp)
    t_pp, pparams = timeit(s_pp, params, z, ctx_t)
    stages.append(("prior_params", t_pp,
                   flops_of(lambda p, z, c: s_pp(p, z, c), params, z, ctx_t)))

    # spatial prior (one pass)
    cat = jnp.concatenate([y, pparams], axis=-1)

    def s_sp(params, cat):
        return model.apply({"params": params},
                           method=lambda m: m.y_spatial_prior(cat))
    s_sp = jax.jit(s_sp)
    t_sp, _ = timeit(s_sp, params, cat)
    stages.append(("spatial_prior(1x)", t_sp,
                   flops_of(lambda p, c: s_sp(p, c), params, cat)))

    # decoder
    def s_dec(params, y, ctx, q):
        return model.apply({"params": params},
                           method=lambda m: m.decoder(y, ctx, q))
    s_dec = jax.jit(s_dec)
    t_dec, feat_out = timeit(s_dec, params, y, ctx, q_vec)
    stages.append(("decoder", t_dec,
                   flops_of(lambda p, y, c, q: s_dec(p, y, c, q),
                            params, y, ctx, q_vec)))

    # recon
    q_rec = jnp.ones((1, 1, 1, cfg.ch_recon), jnp.bfloat16)

    def s_rec(params, f, q):
        return model.apply({"params": params},
                           method=lambda m: m.recon_generation_net(f, q))
    s_rec = jax.jit(s_rec)
    t_rec, _ = timeit(s_rec, params, feat_out, q_rec)
    stages.append(("recon_generation", t_rec,
                   flops_of(lambda p, f, q: s_rec(p, f, q),
                            params, feat_out, q_rec)))

    # bit estimation (z)
    def s_bits(params, z, qp):
        def go(m):
            return m.bit_estimator_z.bits(z, qp)
        return model.apply({"params": params}, method=go)
    s_bits = jax.jit(s_bits)
    t_bits, _ = timeit(s_bits, params, z, qp)
    stages.append(("bit_estimator_z", t_bits, 0.0))

    print()
    tot = 0.0
    for name, t, fl in stages:
        tot += t
        eff = fl / t / 1e12 if fl else 0.0
        print(f"{name:20s} {t*1e3:8.2f} ms  {fl/1e9:8.1f} GFLOP  "
              f"{eff:6.2f} TFLOP/s")
    print(f"{'sum of stages':20s} {tot*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
