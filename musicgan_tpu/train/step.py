"""Jitted WGAN-GP train steps with donated buffers.

The reference's eager per-iteration loop (reference ``train.py:131-214``)
becomes compiled graphs per growth stage:

* ``build_step``       — one iteration per dispatch, two variants per stage
  (critic-only, and critic+generator for every 5th iteration — the
  n_critic schedule of reference ``train.py:189`` decided on the host);
* ``build_chunk_step`` — K iterations per dispatch via ``lax.scan``, the
  per-iteration G-update selected by a traced mask (``lax.cond``).  One
  host round trip per K steps: at small growth stages the single-step
  graph is dispatch-bound, so chunking approaches pure-compute throughput.
  RNG handling is identical to the single-step path, so a chunk of K steps
  produces bit-identical state to K single steps (tested).

Each graph fuses: per-stage input pipeline (min-max -> [-1,1] -> resize,
reference ``utils.py:70-86``) -> G forward -> D forwards -> WGAN-GP loss
with the gradient penalty as a ``jax.grad`` composition (grad-of-grad,
replacing the reference's ``autograd.grad(create_graph=True)`` double
backward, ``discriminator.py:157-184``) -> Adam updates -> metric scalars.

Intentional divergence from the reference: the critic's loss gradient is
taken w.r.t. critic parameters only, so it cannot leak into the generator
(the reference forgets to detach ``x_fake`` — ``train.py:152-156`` — and
then discards the spurious generator grads with ``zero_grad``).

Metrics are returned as device scalars; the host reads them on the logging
cadence only, avoiding the reference's ~6 blocking ``.item()`` syncs per
step (``train.py:180-186,218-221``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..audio.transforms import grower_transform
from ..config import ModelConfig, TrainConfig
from ..models import (
    discriminator_forward,
    generator_forward,
    wasserstein_discriminator_loss,
    wasserstein_generator_loss,
)

__all__ = [
    "TrainState",
    "init_train_state",
    "make_optimizers",
    "build_step",
    "build_chunk_step",
]


class TrainState(NamedTuple):
    """Whole-run training state: a single shape-stable pytree.

    Because every per-stage head is pre-allocated (see models/), this state
    never changes structure at growth boundaries — unlike the reference,
    whose optimizer grows param groups mid-run (``train.py:262-272``).
    """

    gen_params: Any
    disc_params: Any
    opt_gen: Any
    opt_disc: Any
    rng: jax.Array
    iter_idx: jax.Array  # int32 scalar
    # EMA copy of gen_params for eval (TrainConfig.ema_decay > 0), else
    # None — an empty pytree subtree, so checkpoints and graphs from
    # EMA-off runs keep their round-2 structure exactly.
    gen_ema: Any = None


def make_optimizers(cfg: TrainConfig):
    """Adam with torch-faithful per-leaf step counts (see train/optim.py):
    a head activating at a growth boundary starts from fresh bias
    correction, exactly like the reference's add_param_group."""
    from .optim import adam_per_leaf

    b1, b2 = cfg.betas
    return (
        adam_per_leaf(cfg.gen_lr, b1=b1, b2=b2),
        adam_per_leaf(cfg.disc_lr, b1=b1, b2=b2),
    )


@functools.lru_cache(maxsize=None)
def _init_fn(model_cfg: ModelConfig, train_cfg: TrainConfig):
    # Memoized so repeated init_train_state calls (resume templates, tests,
    # benches) reuse ONE compiled graph — a fresh closure per call would
    # recompile every time.
    from ..models import init_discriminator, init_generator

    opt_g, opt_d = make_optimizers(train_cfg)

    @jax.jit
    def _init(key):
        kg, kd, kr = jax.random.split(key, 3)
        gen_params = init_generator(kg, model_cfg)
        disc_params = init_discriminator(kd, model_cfg)
        return TrainState(
            gen_params=gen_params,
            disc_params=disc_params,
            opt_gen=opt_g.init(gen_params),
            opt_disc=opt_d.init(disc_params),
            rng=kr,
            iter_idx=jnp.zeros((), jnp.int32),
            gen_ema=(
                jax.tree.map(jnp.copy, gen_params)
                if train_cfg.ema_decay > 0
                else None
            ),
        )

    return _init


def init_train_state(
    key: jax.Array,
    model_cfg: ModelConfig = ModelConfig(),
    train_cfg: TrainConfig = TrainConfig(),
) -> TrainState:
    """Build the full run state in ONE jitted graph (eager init would
    dispatch ~100 individually-compiled ops on a cold backend)."""
    return _init_fn(model_cfg, train_cfg)(key)


def _make_iteration(
    stage: int,
    model_cfg: ModelConfig,
    train_cfg: TrainConfig,
    pre_scaled: bool,
):
    """Shared per-iteration core.  Returns ``iteration(state, x_raw, alpha,
    do_g)`` where ``do_g`` may be a Python bool (static; dead branch pruned
    at trace time) or a traced bool (lowered to ``lax.cond``)."""
    from ..ops.autotune import SECOND_ORDER_IMPLS, resolve_conv_impl

    # Training differentiates through the generator: resolve conv_impl to a
    # differentiable lowering (rejects inference-only Pallas impls
    # explicitly).  With train_cfg given, "auto" is measured on a real
    # train-step graph (fwd + GP + bwd + Adam), not the inference forward.
    z_shape = (
        train_cfg.batch_size, model_cfg.latent_height,
        model_cfg.latent_width, model_cfg.rand_channels,
    )
    model_cfg = resolve_conv_impl(
        model_cfg, z_shape, stage, for_training=True, train_cfg=train_cfg
    )
    # The WGAN-GP branch differentiates the critic TWICE (grad-of-grad);
    # jax.custom_vjp supports one differentiation, so "pallas_train" covers
    # only the first-order contexts (out_real/out_fake/g_branch) and the
    # GP's critic keeps the plain XLA lowering.
    gp_model_cfg = (
        model_cfg
        if model_cfg.conv_impl in SECOND_ORDER_IMPLS
        else dataclasses.replace(model_cfg, conv_impl="xla")
    )
    size = 4 * 2**stage
    disc_stage = len(model_cfg.disc_channels) - 2 - stage  # 7 -> 0
    # "bfloat16_f32gp": bf16 matmul/conv operands in every forward EXCEPT
    # the gradient-penalty branch.  The round-2 study (VALIDATION.md r2)
    # found plain bf16 destabilizes exactly the GP — it regularizes an
    # INPUT gradient, the quantity operand rounding perturbs most — so the
    # mixed recipe pins that one branch to f32 and keeps bf16's HBM savings
    # everywhere else.
    dtype = (
        jnp.bfloat16
        if train_cfg.compute_dtype in ("bfloat16", "bfloat16_f32gp")
        else jnp.float32
    )
    gp_dtype = (
        jnp.float32
        if train_cfg.compute_dtype == "bfloat16_f32gp"
        else dtype
    )
    gp_w = train_cfg.grad_penalty_weight
    opt_g, opt_d = make_optimizers(train_cfg)

    def gen_fwd(params, z, alpha):
        return generator_forward(params, z, stage, alpha, model_cfg, dtype)

    def disc_fwd(params, x, alpha):
        return discriminator_forward(
            params, x, disc_stage, alpha, model_cfg, dtype
        )

    def disc_fwd_gp(params, x, alpha):
        # Second-order-differentiable critic for the gradient penalty.
        return discriminator_forward(
            params, x, disc_stage, alpha, gp_model_cfg, gp_dtype
        )

    def d_loss_fn(disc_params, x_real, x_fake, eps, alpha):
        out_real = disc_fwd(disc_params, x_real, alpha)
        out_fake = disc_fwd(disc_params, x_fake, alpha)
        w_loss = wasserstein_discriminator_loss(out_real, out_fake)
        if train_cfg.drift_eps:  # static: 0.0 keeps the reference graph
            # ProGAN eps-drift: anchors the critic's output scale (the
            # Wasserstein objective is shift-invariant, so D(x) wanders
            # unboundedly on small corpora — VALIDATION.md r2).
            w_loss = w_loss + train_cfg.drift_eps * jnp.mean(
                jnp.square(out_real)
            )

        # WGAN-GP (reference discriminator.py:157-184): gradient of the
        # critic at a random interpolate must have unit norm.
        x_hat = eps * x_real + (1.0 - eps) * x_fake

        if model_cfg.conv_impl == "pallas_gp":
            # Explicit hand-derived inner backward on the Pallas kernels
            # (first-order ops only; the outer value_and_grad then
            # differentiates it ONCE — see critic_input_grad_nchw_train).
            from ..models.discriminator import critic_input_grad_nchw_train

            g = critic_input_grad_nchw_train(
                disc_params, x_hat, disc_stage, alpha, model_cfg
            )
        else:

            def critic_sum(x):
                return jnp.sum(disc_fwd_gp(disc_params, x, alpha))

            g = jax.grad(critic_sum)(x_hat)
        g_norm = jnp.sqrt(
            jnp.sum(jnp.square(g.reshape(g.shape[0], -1)), axis=1) + 1e-12
        )
        gp = gp_w * jnp.mean(jnp.square(g_norm - 1.0))

        metrics = {
            "disc_loss": w_loss,
            "grad_pen": gp,
            "e_tp": jnp.mean(out_real),
            "e_tn": jnp.mean(out_fake),
        }
        return w_loss + gp, metrics

    def g_loss_fn(gen_params, disc_params, z, alpha):
        x_fake = gen_fwd(gen_params, z, alpha)
        out_fake = disc_fwd(disc_params, x_fake, alpha)
        loss = wasserstein_generator_loss(out_fake)
        return loss, {"gen_loss": loss, "e_gen": jnp.mean(out_fake)}

    def iteration(state: TrainState, x_raw, alpha, do_g):
        rng, k_z, k_eps, k_zg = jax.random.split(state.rng, 4)
        batch = x_raw.shape[0]
        z_shape = (
            batch,
            model_cfg.latent_height,
            model_cfg.latent_width,
            model_cfg.rand_channels,
        )

        if pre_scaled:
            x_real = x_raw.astype(jnp.float32)
        else:
            # Per-stage input pipeline, on device, inside the graph.
            x_real = grower_transform(x_raw, size)
        x_real = x_real.transpose(0, 2, 3, 1)  # NCHW -> NHWC

        z = jax.random.normal(k_z, z_shape)
        x_fake = jax.lax.stop_gradient(gen_fwd(state.gen_params, z, alpha))
        eps = jax.random.uniform(k_eps, (batch, 1, 1, 1))

        (_, d_metrics), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            state.disc_params, x_real, x_fake, eps, alpha
        )
        d_updates, opt_disc = opt_d.update(
            d_grads, state.opt_disc, state.disc_params
        )
        disc_params = optax.apply_updates(state.disc_params, d_updates)

        ema_d = train_cfg.ema_decay  # static

        def g_branch(gen_params, opt_gen, gen_ema):
            zg = jax.random.normal(k_zg, z_shape)
            # Reference order: G trains against the *updated* critic
            # (optim_disc.step() ran first, train.py:175 vs :189-214).
            (_, g_metrics), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(gen_params, disc_params, zg, alpha)
            g_updates, opt_gen = opt_g.update(g_grads, opt_gen, gen_params)
            gen_params = optax.apply_updates(gen_params, g_updates)
            if ema_d > 0:  # ProGAN §A.1: EMA over generator UPDATES
                gen_ema = jax.tree.map(
                    lambda e, p: ema_d * e + (1.0 - ema_d) * p,
                    gen_ema, gen_params,
                )
            return gen_params, opt_gen, gen_ema, g_metrics

        def no_g_branch(gen_params, opt_gen, gen_ema):
            return (
                gen_params,
                opt_gen,
                gen_ema,
                {"gen_loss": jnp.zeros(()), "e_gen": jnp.zeros(())},
            )

        if isinstance(do_g, bool):  # static: prune the dead branch
            branch = g_branch if do_g else no_g_branch
            gen_params, opt_gen, gen_ema, g_metrics = branch(
                state.gen_params, state.opt_gen, state.gen_ema
            )
        else:  # traced: one graph, conditional execution on device
            gen_params, opt_gen, gen_ema, g_metrics = jax.lax.cond(
                do_g, g_branch, no_g_branch,
                state.gen_params, state.opt_gen, state.gen_ema,
            )

        new_state = TrainState(
            gen_params=gen_params,
            disc_params=disc_params,
            opt_gen=opt_gen,
            opt_disc=opt_disc,
            rng=rng,
            iter_idx=state.iter_idx + 1,
            gen_ema=gen_ema,
        )
        return new_state, {**d_metrics, **g_metrics}

    return iteration


def _apply_shardings(fn, mesh, data_axis, n_extra_repl: int, data_rank_prefix=0):
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    data = NamedSharding(
        mesh, P(*([None] * data_rank_prefix), data_axis or "data")
    )
    return jax.jit(
        fn,
        donate_argnums=(0,),
        in_shardings=(repl, data) + (repl,) * n_extra_repl,
        out_shardings=(repl, repl),
    )


@functools.lru_cache(maxsize=None)
def build_step(
    stage: int,
    with_gen: bool,
    model_cfg: ModelConfig = ModelConfig(),
    train_cfg: TrainConfig = TrainConfig(),
    mesh=None,
    data_axis: str | None = None,
    pre_scaled: bool = False,
    device_data: bool = False,
):
    """Compile a one-iteration graph for ``stage``.  Memoized on all
    arguments (configs are frozen dataclasses, ``Mesh`` is hashable): the
    same logical step is ONE compiled graph process-wide.

    Returns ``step(state, x_raw, alpha) -> (state, metrics)``; ``x_raw`` is
    ``(B, 2, H, W)`` float32 (full-res, or stage-res when ``pre_scaled``),
    ``alpha`` the fade-in scalar.  When ``mesh`` is given the batch is
    sharded over ``data_axis``, the state replicated, and XLA inserts the
    gradient all-reduces implied by the loss mean-reductions.
    """
    iteration = _make_iteration(stage, model_cfg, train_cfg, pre_scaled)

    if device_data:
        # Device-resident dataset mode: the whole corpus lives in HBM and
        # each dispatch ships only row indices — steady-state H2D drops
        # from megabytes to bytes per step (and sidesteps PJRT clients
        # that retain every transfer buffer; PERF.md).  The per-stage
        # input pipeline necessarily runs in-graph.
        #
        # On a mesh, the corpus is SHARDED along the sample axis (each
        # device holds N/n_dev rows) and the index batch along the data
        # axis.  GSPMD lowers the gather-from-sharded-operand as: all-
        # gather of the (tiny) index vector, masked local gather, then an
        # all-reduce of the BATCH-sized partial result — communication is
        # O(batch bytes) per step and never touches corpus-sized buffers
        # (verified in the compiled HLO; tests/test_parallel.py pins
        # numerical parity with the streaming-sharded path).
        assert not pre_scaled, "device_data implies the in-graph pipeline"

        def step_dev(state, data, idx, alpha):
            # Upcast at the gather: the resident corpus may be stored
            # bf16 (device_dataset_dtype) — compute always runs f32.
            x_raw = jnp.take(data, idx, axis=0).astype(jnp.float32)
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                # Pin the gathered batch to the same layout the streaming
                # path feeds the iteration (batch sharded on the data axis).
                x_raw = jax.lax.with_sharding_constraint(
                    x_raw, NamedSharding(mesh, P(data_axis or "data"))
                )
            return iteration(state, x_raw, alpha, bool(with_gen))

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            dsh = NamedSharding(mesh, P(data_axis or "data"))
            return jax.jit(
                step_dev,
                donate_argnums=(0,),
                in_shardings=(repl, dsh, dsh, repl),
                out_shardings=(repl, repl),
            )
        return jax.jit(step_dev, donate_argnums=(0,))

    def step(state, x_raw, alpha):
        return iteration(state, x_raw, alpha, bool(with_gen))

    if mesh is not None:
        return _apply_shardings(step, mesh, data_axis, n_extra_repl=1)
    return jax.jit(step, donate_argnums=(0,))


@functools.lru_cache(maxsize=None)
def build_chunk_step(
    stage: int,
    chunk: int,
    model_cfg: ModelConfig = ModelConfig(),
    train_cfg: TrainConfig = TrainConfig(),
    mesh=None,
    data_axis: str | None = None,
    pre_scaled: bool = False,
    device_data: bool = False,
):
    """Compile a K-iteration graph: ``chunk_step(state, x_stack, alphas,
    gen_mask) -> (state, metrics_stack)``.  Memoized like ``build_step``.

    ``x_stack``: ``(K, B, 2, H, W)``; ``alphas``: ``(K,)`` fade-in per
    iteration; ``gen_mask``: ``(K,)`` bool, True where the generator
    updates (the n_critic pattern, computed on the host).  Metrics come
    back stacked ``(K,)`` per key.  Bit-identical to ``chunk`` single
    steps.
    """
    iteration = _make_iteration(stage, model_cfg, train_cfg, pre_scaled)

    if device_data:
        assert not pre_scaled, "device_data implies the in-graph pipeline"

        def chunk_step_dev(state, data, idx_stack, alphas, gen_mask):
            assert idx_stack.shape[0] == chunk

            def body(carry, inp):
                idx, alpha, do_g = inp
                # bf16-resident corpora upcast at the gather (see step_dev)
                x = jnp.take(data, idx, axis=0).astype(jnp.float32)
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    x = jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, P(data_axis or "data"))
                    )
                return iteration(carry, x, alpha, do_g)

            return jax.lax.scan(body, state, (idx_stack, alphas, gen_mask))

        if mesh is not None:
            # Corpus sharded on the sample axis; idx_stack is (K, B) with
            # the batch dim sharded (mirrors the streaming x_stack layout).
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(mesh, P())
            dsh = NamedSharding(mesh, P(data_axis or "data"))
            idx_sh = NamedSharding(mesh, P(None, data_axis or "data"))
            return jax.jit(
                chunk_step_dev,
                donate_argnums=(0,),
                in_shardings=(repl, dsh, idx_sh, repl, repl),
                out_shardings=(repl, repl),
            )
        return jax.jit(chunk_step_dev, donate_argnums=(0,))

    def chunk_step(state, x_stack, alphas, gen_mask):
        assert x_stack.shape[0] == chunk, (
            f"x_stack carries {x_stack.shape[0]} iterations, "
            f"chunk graph was built for {chunk}"
        )

        def body(carry, inp):
            x, alpha, do_g = inp
            new_state, metrics = iteration(carry, x, alpha, do_g)
            return new_state, metrics

        return jax.lax.scan(body, state, (x_stack, alphas, gen_mask))

    if mesh is not None:
        # x_stack batch axis is dim 1: shard P(None, "data", ...).
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(None, data_axis or "data"))
        return jax.jit(
            chunk_step,
            donate_argnums=(0,),
            in_shardings=(repl, data, repl, repl),
            out_shardings=(repl, repl),
        )
    return jax.jit(chunk_step, donate_argnums=(0,))
