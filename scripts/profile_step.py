"""Decompose the WGAN-GP train iteration into timed segments.

The r3 kernels fused the conv forwards and the GP inner gradient
(PERF.md); this tool measures what is LEFT of the per-iteration budget —
each segment is wrapped in a K-step ``lax.scan`` with a scalar carry
(sequential dependency, one dispatch) so tunnel RTT amortizes exactly as
in ``bench.py``.  Segments:

  gen_fwd   generator forward (the critic's fake batch)
  wgan_d    value_and_grad of the Wasserstein D loss WITHOUT the penalty
            (two critic forwards + one critic backward)
  gp_term   value_and_grad of the gradient-penalty term alone
            (inner input-gradient + outer backward through it)
  adam_d    Adam update + apply on the critic grads
  g_step    full generator update (fwd through G+D, backward, Adam, EMA)
  full      the production iteration (build_chunk_step, K iters)

Segment sums exceed ``full`` slightly (XLA fuses across segment
boundaries in the real graph; the split re-materializes shared values).

Usage:
  python scripts/profile_step.py [--stage 7] [--batch 6] [--k 4]
      [--conv-impl auto] [--reps 5]
"""

from __future__ import annotations

import _bootstrap  # noqa: F401  (repo root onto sys.path)

import argparse
import dataclasses
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=7)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--k", type=int, default=5,
                    help="iterations per scanned dispatch; keep a "
                         "multiple of n_critic (5) so the full graph's "
                         "G amortization is exactly 1/n_critic")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--conv-impl", default="auto")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from musicgan_tpu.config import ModelConfig, TrainConfig
    from musicgan_tpu.models.discriminator import discriminator_forward
    from musicgan_tpu.models.generator import generator_forward
    from musicgan_tpu.models.losses import (
        wasserstein_discriminator_loss,
        wasserstein_generator_loss,
    )
    from musicgan_tpu.ops.autotune import SECOND_ORDER_IMPLS, resolve_conv_impl
    from musicgan_tpu.train.step import (
        build_chunk_step,
        init_train_state,
        make_optimizers,
    )
    from musicgan_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    stage, B, K = args.stage, args.batch, args.k
    size = 4 * 2**stage
    model_cfg = dataclasses.replace(ModelConfig(), conv_impl=args.conv_impl)
    train_cfg = TrainConfig(batch_size=B)
    z_shape = (B, model_cfg.latent_height, model_cfg.latent_width,
               model_cfg.rand_channels)
    model_cfg = resolve_conv_impl(
        model_cfg, z_shape, stage, for_training=True, train_cfg=train_cfg
    )
    gp_model_cfg = (
        model_cfg if model_cfg.conv_impl in SECOND_ORDER_IMPLS
        else dataclasses.replace(model_cfg, conv_impl="xla")
    )
    print(f"stage {stage} batch {B} K {K} conv_impl {model_cfg.conv_impl}")

    disc_stage = len(model_cfg.disc_channels) - 2 - stage
    state = init_train_state(jax.random.PRNGKey(0), model_cfg, train_cfg)
    opt_g, opt_d = make_optimizers(train_cfg)

    rng = np.random.default_rng(0)
    zs = jnp.asarray(rng.normal(size=(K,) + z_shape).astype(np.float32))
    xs = jnp.asarray(
        rng.uniform(-1, 1, (K, B, size, size, 2)).astype(np.float32)
    )
    eps = jnp.asarray(rng.uniform(size=(K, B, 1, 1, 1)).astype(np.float32))

    def gen_fwd(params, z):
        return generator_forward(params, z, stage, 1.0, model_cfg,
                                 jnp.float32)

    def disc_fwd(params, x):
        return discriminator_forward(params, x, disc_stage, 1.0, model_cfg,
                                     jnp.float32)

    def disc_fwd_gp(params, x):
        return discriminator_forward(params, x, disc_stage, 1.0,
                                     gp_model_cfg, jnp.float32)

    x_fake0 = jax.block_until_ready(gen_fwd(state.gen_params, zs[0]))

    def wgan_d_loss(dp, x_real, x_fake):
        return wasserstein_discriminator_loss(
            disc_fwd(dp, x_real), disc_fwd(dp, x_fake)
        )

    def gp_loss(dp, x_real, x_fake, e):
        x_hat = e * x_real + (1.0 - e) * x_fake
        if model_cfg.conv_impl == "pallas_gp":
            from musicgan_tpu.models.discriminator import (
                critic_input_grad_nchw_train,
            )

            g = critic_input_grad_nchw_train(
                dp, x_hat, disc_stage, 1.0, model_cfg
            )
        else:
            g = jax.grad(lambda x: jnp.sum(disc_fwd_gp(dp, x)))(x_hat)
        g_norm = jnp.sqrt(
            jnp.sum(jnp.square(g.reshape(g.shape[0], -1)), axis=1) + 1e-12
        )
        return train_cfg.grad_penalty_weight * jnp.mean(
            jnp.square(g_norm - 1.0)
        )

    d_grads0 = jax.block_until_ready(
        jax.grad(wgan_d_loss)(state.disc_params, xs[0], x_fake0)
    )

    def g_loss(gp_, dp, z):
        return wasserstein_generator_loss(disc_fwd(dp, gen_fwd(gp_, z)))

    leaf_sum = lambda t: sum(  # noqa: E731 — scalar carry dependency
        jnp.sum(x) for x in jax.tree_util.tree_leaves(t)
    )

    # Segments take ``st`` (the TrainState) as a traced argument — closing
    # over it would bake the params into the graph as constants and let
    # XLA constant-fold parts of the compute being measured.
    segments = {
        "gen_fwd": lambda c, i, st: c + jnp.sum(
            gen_fwd(st.gen_params, zs[i] + c * 0)
        ),
        "wgan_d": lambda c, i, st: c + leaf_sum(
            jax.grad(wgan_d_loss)(
                st.disc_params, xs[i] + c * 0, x_fake0
            )
        ),
        "gp_term": lambda c, i, st: c + leaf_sum(
            jax.grad(gp_loss)(
                st.disc_params, xs[i] + c * 0, x_fake0, eps[i]
            )
        ),
        # Candidate restructuring: ONE batch-2B critic pass for real+fake
        # (numerically identical — the critic has no cross-batch ops).
        "wgan_d_cat": lambda c, i, st: c + leaf_sum(
            jax.grad(
                lambda dp, xr, xf: wasserstein_discriminator_loss(
                    *jnp.split(
                        disc_fwd(dp, jnp.concatenate([xr, xf])), 2
                    )
                )
            )(st.disc_params, xs[i] + c * 0, x_fake0)
        ),
        "adam_d": lambda c, i, st: c + leaf_sum(
            optax.apply_updates(
                st.disc_params,
                opt_d.update(
                    jax.tree.map(lambda g: g + c * 0, d_grads0),
                    st.opt_disc, st.disc_params,
                )[0],
            )
        ),
        "g_step": lambda c, i, st: c + leaf_sum(
            optax.apply_updates(
                st.gen_params,
                opt_g.update(
                    jax.grad(g_loss)(
                        st.gen_params, st.disc_params, zs[i] + c * 0
                    ),
                    st.opt_gen, st.gen_params,
                )[0],
            )
        ),
    }

    def timed(fn):
        @jax.jit
        def scanned(st):
            c, _ = jax.lax.scan(
                lambda c, i: (fn(c, i, st), None), jnp.zeros(()),
                jnp.arange(K),
            )
            return c

        jax.block_until_ready(scanned(state))  # compile
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(scanned(state))
            best = min(best, time.perf_counter() - t0)
        return best / K

    results = {}
    for name, fn in segments.items():
        results[name] = timed(fn)
        print(f"{name:>8}: {results[name] * 1e3:8.2f} ms")

    # Production full iteration for reference (same K, chunked scan).
    chunk = build_chunk_step(stage, K, model_cfg, train_cfg,
                             pre_scaled=True)
    xs_nchw = jnp.transpose(xs, (0, 1, 4, 2, 3))
    alphas = jnp.ones((K,), jnp.float32)
    gmask = jnp.asarray([i % train_cfg.n_critic == 0 for i in range(K)])
    st, m = chunk(state, xs_nchw, alphas, gmask)
    jax.block_until_ready(m["disc_loss"])
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        st, m = chunk(st, xs_nchw, alphas, gmask)
        jax.block_until_ready(m["disc_loss"])
        best = min(best, time.perf_counter() - t0)
    results["full"] = best / K
    # wgan_d_cat is an ALTERNATIVE formulation of wgan_d (a candidate
    # restructuring), not a production segment — keep it out of the sum.
    seg_sum = sum(
        v for k, v in results.items() if k not in ("full", "wgan_d_cat")
    )
    g_per_iter = results["g_step"] * sum(
        1 for i in range(K) if i % train_cfg.n_critic == 0
    ) / K
    seg_sum = seg_sum - results["g_step"] + g_per_iter
    print(f"{'full':>8}: {results['full'] * 1e3:8.2f} ms   "
          f"(amortized segment sum {seg_sum * 1e3:.2f} ms; full runs "
          f"{sum(1 for i in range(K) if i % train_cfg.n_critic == 0)} "
          f"G step(s) per {K} iters)")


if __name__ == "__main__":
    main()
