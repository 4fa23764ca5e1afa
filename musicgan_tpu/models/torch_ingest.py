"""Reference-checkpoint ingest: PyTorch ``state_dict`` -> JAX pytrees.

The reference saves Python name-mangled state dicts
(``_Generator__gen_blocks.*``, ``_Discriminator__conv_blocks.*`` — SURVEY.md
§0), e.g. the bundled fully-grown ``saved_models/electronic_gems/gen_419.pt``.
This module maps those onto our parameter pytrees so reference-trained
models drive inference here (BASELINE.md config 2).

Key layout facts (verified against reference module definitions):

* Generator ``Block`` is ``Sequential(Conv, LeakyReLU, PixelNorm, Upsample,
  Conv, LeakyReLU, PixelNorm)`` -> convs at indices 0 and 4
  (reference ``generator.py:9-40``);
* ``__end_block`` = head of the current stage, ``__last_end_block.0`` = head
  of the previous stage (reference ``generator.py:86-103``);
* Discriminator ``ConvBlock`` is ``Sequential(Conv, LeakyReLU, AvgPool,
  Conv, LeakyReLU)`` -> convs at 0 and 3 (reference ``discriminator.py:8-34``);
  ``__start_block`` = current input head, ``__last_start_block.1`` = previous
  (wrapped behind AvgPool), ``__clf.0`` = final Linear
  (reference ``discriminator.py:94-147``);
* torch conv weights are OIHW -> ours are HWIO; torch Linear is (out, in)
  -> ours (in, out).  The final flatten happens at 1x1 spatial, so layout
  order does not matter for the Linear.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from .discriminator import init_discriminator
from .generator import init_generator

__all__ = [
    "load_reference_generator",
    "load_reference_discriminator",
    "export_reference_generator",
    "export_reference_discriminator",
    "export_reference_adam",
    "load_reference_adam",
    "export_reference_save",
    "import_reference_run",
]


def _load_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}


def _conv(sd: dict, prefix: str) -> dict:
    w = sd[f"{prefix}.weight"]  # OIHW
    b = sd[f"{prefix}.bias"]
    return {
        "w": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),  # -> HWIO
        "b": jnp.asarray(b),
    }


def load_reference_generator(
    path: str,
    cfg: ModelConfig = ModelConfig(),
    stage: int | None = None,
) -> dict:
    """Load a reference generator ``state_dict`` into our pytree.

    ``stage``: growth stage the checkpoint was saved at (None = infer from
    the ``__end_block`` head's input-channel count).  Heads for other stages
    keep fresh-init values; they are unused in a ``stage`` forward at
    alpha=1 and only the ``stage-1`` head affects fade-in.
    """
    sd = _load_state_dict(path)
    params = init_generator(jax.random.PRNGKey(0), cfg)

    for i in range(cfg.n_stages):
        pre = f"_Generator__gen_blocks.{i}"
        if f"{pre}.0.weight" not in sd:
            break
        params["blocks"][i] = {
            "conv1": _conv(sd, f"{pre}.0"),
            "conv2": _conv(sd, f"{pre}.4"),
        }

    head = _conv(sd, "_Generator__end_block.0")
    if stage is None:
        cin = head["w"].shape[2]
        stage = next(
            s for s, (_, cout) in enumerate(cfg.gen_channels) if cout == cin
        )
    params["heads"][stage] = head
    if stage > 0 and "_Generator__last_end_block.0.0.weight" in sd:
        params["heads"][stage - 1] = _conv(sd, "_Generator__last_end_block.0.0")
    return params


def export_reference_generator(
    params: dict,
    path: str,
    stage: int = 7,
    cfg: ModelConfig = ModelConfig(),
) -> None:
    """Write our generator pytree as a reference-format ``state_dict`` so
    reference tooling (``generate.py:29-38``) can load models trained here.
    Inverse of :func:`load_reference_generator`."""
    import torch

    def t_conv(p):
        w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))  # HWIO -> OIHW
        return (
            torch.from_numpy(np.array(w, copy=True)),
            torch.from_numpy(np.array(p["b"], copy=True)),
        )

    sd = {}
    for i, blk in enumerate(params["blocks"]):
        for key, idx in (("conv1", 0), ("conv2", 4)):
            w, b = t_conv(blk[key])
            sd[f"_Generator__gen_blocks.{i}.{idx}.weight"] = w
            sd[f"_Generator__gen_blocks.{i}.{idx}.bias"] = b
    w, b = t_conv(params["heads"][stage])
    sd["_Generator__end_block.0.weight"] = w
    sd["_Generator__end_block.0.bias"] = b
    if stage > 0:
        w, b = t_conv(params["heads"][stage - 1])
        sd["_Generator__last_end_block.0.0.weight"] = w
        sd["_Generator__last_end_block.0.0.bias"] = b
    torch.save(sd, path)


def export_reference_discriminator(
    params: dict,
    path: str,
    layer: int = 0,
    cfg: ModelConfig = ModelConfig(),
) -> None:
    """Write our discriminator pytree as a reference-format ``state_dict``
    (``disc_{i}.pt``).  ``layer`` is the reference's ``curr_layer`` — the
    conv-block index the current input head feeds (7 at gen stage 0, 0
    fully grown; our disc stage uses the same convention).  Inverse of
    :func:`load_reference_discriminator`."""
    import torch

    def t_conv(p):
        w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))  # HWIO -> OIHW
        return (
            torch.from_numpy(np.array(w, copy=True)),
            torch.from_numpy(np.array(p["b"], copy=True)),
        )

    sd = {}
    for i, blk in enumerate(params["blocks"]):
        for key, idx in (("conv1", 0), ("conv2", 3)):
            w, b = t_conv(blk[key])
            sd[f"_Discriminator__conv_blocks.{i}.{idx}.weight"] = w
            sd[f"_Discriminator__conv_blocks.{i}.{idx}.bias"] = b
    w, b = t_conv(params["heads"][layer])
    sd["_Discriminator__start_block.0.weight"] = w
    sd["_Discriminator__start_block.0.bias"] = b
    if layer < len(cfg.disc_channels) - 2:
        # grown at least once: the previous head lives behind the AvgPool
        # (reference discriminator.py::next_layer)
        w, b = t_conv(params["heads"][layer + 1])
        sd["_Discriminator__last_start_block.1.0.weight"] = w
        sd["_Discriminator__last_start_block.1.0.bias"] = b
    lin_w = np.asarray(params["clf"]["w"]).T  # (in, out) -> (out, in)
    sd["_Discriminator__clf.0.weight"] = torch.from_numpy(
        np.array(lin_w, copy=True)
    )
    sd["_Discriminator__clf.0.bias"] = torch.from_numpy(
        np.array(np.asarray(params["clf"]["b"]), copy=True)
    )
    torch.save(sd, path)


# ---------------------------------------------------------------------------
# Optimizer-state interop (reference ``optim_gen_{i}.pt`` /
# ``optim_disc_{i}.pt`` — torch.optim.Adam state_dicts).
#
# The reference constructs Adam over the INITIAL module's parameters()
# and calls ``add_param_group`` with each newly-grown head
# (``train.py:64-69,262-272``), so a saved state_dict has one param group
# per growth and torch's ordinal parameter indexing follows module
# registration order.  Our ``adam_per_leaf`` keeps torch-faithful per-leaf
# step counts, so the mapping is a clean bijection:
#   torch state[i]["step"]        <-> count leaf   (0-count leaves have no
#                                                   torch entry: never stepped)
#   torch state[i]["exp_avg"]     <-> mu leaf      (layout-transposed)
#   torch state[i]["exp_avg_sq"]  <-> nu leaf      (layout-transposed)
# ---------------------------------------------------------------------------


def _gen_param_order(stage: int, cfg: ModelConfig):
    """Reference-optimizer ordinal parameter paths for the generator at
    growth ``stage``, plus the param-group index lists ``train.py`` would
    have built by then.

    Registration order (reference ``generator.py:54-103``): the full
    ``__gen_blocks`` ModuleList is pre-built at construction (all 8
    blocks), then ``__end_block`` (head 0) — 34 params in Adam's group 0;
    each ``next_layer`` adds the fresh head as a 2-param group while
    ``__last_end_block`` reuses the previous head's tensors."""
    order = []
    for i in range(cfg.n_stages):
        for conv in ("conv1", "conv2"):
            order += [("blocks", i, conv, "w"), ("blocks", i, conv, "b")]
    order += [("heads", 0, "w"), ("heads", 0, "b")]
    groups = [list(range(len(order)))]
    for s in range(1, stage + 1):
        groups.append([len(order), len(order) + 1])
        order += [("heads", s, "w"), ("heads", s, "b")]
    return order, groups


def _disc_param_order(layer: int, cfg: ModelConfig):
    """Same for the discriminator at ``curr_layer == layer``.

    Registration order (reference ``discriminator.py:52-104``): all 9
    ``__conv_blocks``, then ``__start_block`` (head 7 — start_layer=7),
    then ``__clf`` — 40 params in group 0; growth walks the head index
    DOWN (6, 5, ... 0), 2 params per group."""
    n = len(cfg.disc_channels)
    order = []
    for i in range(n):
        for conv in ("conv1", "conv2"):
            order += [("blocks", i, conv, "w"), ("blocks", i, conv, "b")]
    start = n - 2  # reference start_layer = 7
    order += [("heads", start, "w"), ("heads", start, "b")]
    order += [("clf", "w"), ("clf", "b")]
    groups = [list(range(len(order)))]
    for h in range(start - 1, layer - 1, -1):
        groups.append([len(order), len(order) + 1])
        order += [("heads", h, "w"), ("heads", h, "b")]
    return order, groups


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _moment_to_torch(arr):
    """Our leaf layout -> the reference's torch layout (moments share the
    parameter's layout): HWIO conv -> OIHW, (in,out) linear -> (out,in)."""
    import torch

    a = np.asarray(arr)
    if a.ndim == 4:
        a = np.transpose(a, (3, 2, 0, 1))
    elif a.ndim == 2:
        a = a.T
    return torch.from_numpy(np.array(a, copy=True))


def _moment_from_torch(t):
    a = t.numpy()
    if a.ndim == 4:
        a = np.transpose(a, (2, 3, 1, 0))
    elif a.ndim == 2:
        a = a.T
    return jnp.asarray(np.array(a, copy=True))


def export_reference_adam(
    opt_state,
    path: str,
    which: str,
    stage: int = 7,
    lr: float = 1e-3,
    betas: tuple = (0.0, 0.9),
    eps: float = 1e-8,
    cfg: ModelConfig = ModelConfig(),
) -> None:
    """Write our per-leaf Adam state (``train/optim.py::PerLeafAdamState``)
    as a reference-format ``torch.optim.Adam`` state_dict
    (``optim_{gen,disc}_{i}.pt``), loadable by
    ``torch.optim.Adam.load_state_dict`` on an optimizer built exactly as
    the reference's ``train.py:64-69,262-272`` builds it.

    ``which``: ``"gen"`` (``stage`` = growth stage 0..7) or ``"disc"``
    (``stage`` = the gen stage; the disc layer is ``7 - stage``).
    Leaves with a zero step count get no state entry — exactly torch's
    lazy-init behavior for parameters that never received a gradient."""
    import torch

    if which == "gen":
        order, groups = _gen_param_order(stage, cfg)
    elif which == "disc":
        order, groups = _disc_param_order(
            len(cfg.disc_channels) - 2 - stage, cfg
        )
    else:
        raise ValueError(f"which must be 'gen' or 'disc', got {which!r}")

    state = {}
    for idx, p in enumerate(order):
        c = int(np.asarray(_get(opt_state.count, p)))
        if c == 0:
            continue
        state[idx] = {
            "step": torch.tensor(float(c)),
            "exp_avg": _moment_to_torch(_get(opt_state.mu, p)),
            "exp_avg_sq": _moment_to_torch(_get(opt_state.nu, p)),
        }

    # Pull the installed torch version's full param-group default key set
    # from a throwaway Adam, so the export stays loadable across torch
    # versions that add group options.
    probe = torch.optim.Adam(
        [torch.nn.Parameter(torch.zeros(1))], lr=lr, betas=betas, eps=eps
    )
    defaults = {
        k: v
        for k, v in probe.state_dict()["param_groups"][0].items()
        if k != "params"
    }
    torch.save(
        {
            "state": state,
            "param_groups": [{**defaults, "params": g} for g in groups],
        },
        path,
    )


def load_reference_adam(
    path: str,
    which: str,
    template,
    stage: int | None = None,
    cfg: ModelConfig = ModelConfig(),
):
    """Load a reference ``optim_{gen,disc}_{i}.pt`` into our per-leaf Adam
    state.  ``template`` is a freshly-initialized ``PerLeafAdamState``
    (zeros) shaped like the matching parameter pytree; mapped leaves are
    filled, unmapped leaves (e.g. heads the reference run never grew)
    stay at count 0 / zero moments, which our update rule treats exactly
    like torch treats state-less params.  ``stage`` (gen growth stage) is
    inferred from the param-group count when None.  Returns
    ``(state, stage)``."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    n_growths = len(sd["param_groups"]) - 1
    if stage is None:
        stage = n_growths
    if which == "gen":
        order, groups = _gen_param_order(stage, cfg)
    elif which == "disc":
        order, groups = _disc_param_order(
            len(cfg.disc_channels) - 2 - stage, cfg
        )
    else:
        raise ValueError(f"which must be 'gen' or 'disc', got {which!r}")
    if [len(g) for g in groups] != [
        len(g["params"]) for g in sd["param_groups"]
    ]:
        raise ValueError(
            f"param-group shape mismatch for {which} at stage {stage}: "
            f"ours {[len(g) for g in groups]} vs saved "
            f"{[len(g['params']) for g in sd['param_groups']]}"
        )

    count = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(),
                                   template.count)
    mu = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), template.mu)
    nu = jax.tree_util.tree_map(lambda x: np.asarray(x).copy(), template.nu)

    def _set(tree, path, val):
        for p in path[:-1]:
            tree = tree[p]
        tree[path[-1]] = val

    def _get(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    # torch enumerates params group-by-group in insertion order — the same
    # ordinal order `order` was built in.
    flat = [i for g in sd["param_groups"] for i in g["params"]]
    for ordinal, torch_idx in enumerate(flat):
        ent = sd["state"].get(torch_idx)
        if ent is None:
            continue  # never stepped: keep zeros / count 0
        p = order[ordinal]
        step = ent["step"]
        step = int(step.item() if torch.is_tensor(step) else step)
        _set(count, p, np.asarray(step, np.int32))
        mu_val = np.asarray(_moment_from_torch(ent["exp_avg"]))
        nu_val = np.asarray(_moment_from_torch(ent["exp_avg_sq"]))
        # Group arity alone can't catch a save from a different
        # ModelConfig whose group sizes coincide; a wrong-shaped moment
        # would otherwise surface only deep inside a jitted update (or
        # broadcast silently).  Pin each moment to the template leaf
        # (ADVICE r4).
        want = _get(template.mu, p).shape
        if mu_val.shape != want or nu_val.shape != want:
            raise ValueError(
                f"{which} Adam moment shape mismatch at "
                f"{'/'.join(map(str, p))}: torch gives "
                f"{mu_val.shape}/{nu_val.shape}, template expects {want} — "
                "the save likely comes from a different ModelConfig"
            )
        _set(mu, p, mu_val)
        _set(nu, p, nu_val)

    make = type(template)
    to_jnp = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    return make(count=to_jnp(count), mu=to_jnp(mu), nu=to_jnp(nu)), stage


def export_reference_save(
    state,
    out_dir: str,
    save_idx: int,
    stage: int = 7,
    cfg: ModelConfig = ModelConfig(),
    gen_lr: float = 1e-3,
    disc_lr: float = 1e-3,
    betas: tuple = (0.0, 0.9),
) -> list:
    """Write a COMPLETE reference-format save — the four files the
    reference's Saver emits per save (``utils.py:118-145``):
    ``gen_{i}.pt``, ``disc_{i}.pt``, ``optim_gen_{i}.pt``,
    ``optim_disc_{i}.pt`` — from our ``TrainState``.  Uses the RAW
    generator weights (not the EMA copy): the optimizer moments pair with
    the weights Adam actually updates, and the reference has no EMA.
    Returns the written paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    layer = len(cfg.disc_channels) - 2 - stage
    paths = [
        os.path.join(out_dir, f"gen_{save_idx}.pt"),
        os.path.join(out_dir, f"disc_{save_idx}.pt"),
        os.path.join(out_dir, f"optim_gen_{save_idx}.pt"),
        os.path.join(out_dir, f"optim_disc_{save_idx}.pt"),
    ]
    export_reference_generator(state.gen_params, paths[0], stage=stage,
                               cfg=cfg)
    export_reference_discriminator(state.disc_params, paths[1], layer=layer,
                                   cfg=cfg)
    export_reference_adam(state.opt_gen, paths[2], "gen", stage=stage,
                          lr=gen_lr, betas=betas, cfg=cfg)
    export_reference_adam(state.opt_disc, paths[3], "disc", stage=stage,
                          lr=disc_lr, betas=betas, cfg=cfg)
    return paths


def import_reference_run(
    ref_dir: str,
    save_idx: int,
    run_dir: str,
    model_cfg: ModelConfig = ModelConfig(),
    train_cfg=None,
    iter_idx: int | None = None,
    seed: int = 0,
) -> tuple:
    """Turn a reference save directory (the four ``*_{i}.pt`` files, e.g.
    the bundled ``saved_models/electronic_gems`` at i=419) into a NATIVE
    run directory: ``{run_dir}/checkpoints/save_0`` holding a full
    ``TrainState`` (weights + Adam moments + per-leaf steps) and a
    ``meta.json`` with grower counters positioned at the checkpoint's
    stage, post fade-in.  ``musicgan_tpu train -o run_dir --resume`` then
    CONTINUES the reference's training run here — a workflow the reference
    itself never had (its ``train.py`` cannot resume).

    ``iter_idx`` defaults to ``save_idx * 1000`` (the reference saves every
    1000 iterations, ``train.py:111-112``).  Returns ``(state, stage)``.

    Fidelity note: heads older than ``stage - 1`` keep fresh-init WEIGHTS
    — the reference's model state_dict format cannot carry them (its own
    ``next_layer`` orphans them from every module) — while their Adam
    MOMENTS do ride along (they stay in the optimizer's param groups, so
    the reference saves them too).  Harmless either way: a head below
    ``stage - 1`` is unreachable in any forward.  Everything the format
    can carry round-trips bit-exactly (verified live on a mid-growth
    stage-5 checkpoint).
    """
    import os

    from ..config import TrainConfig
    from ..train.checkpoint import CheckpointManager
    from ..train.grower import Grower
    from ..train.step import init_train_state

    train_cfg = train_cfg if train_cfg is not None else TrainConfig()

    gen_path = os.path.join(ref_dir, f"gen_{save_idx}.pt")
    gen_params = load_reference_generator(gen_path, model_cfg)
    disc_params = load_reference_discriminator(
        os.path.join(ref_dir, f"disc_{save_idx}.pt"), model_cfg
    )

    # template carries fresh zero opt states + rng; ingest overwrites the
    # rest.  Stage comes from the optim file's param-group count (more
    # reliable than head-shape inference for a mid-growth save).
    template = init_train_state(
        jax.random.PRNGKey(seed), model_cfg, train_cfg
    )
    opt_gen, stage = load_reference_adam(
        os.path.join(ref_dir, f"optim_gen_{save_idx}.pt"),
        "gen", template.opt_gen, cfg=model_cfg,
    )
    opt_disc, _ = load_reference_adam(
        os.path.join(ref_dir, f"optim_disc_{save_idx}.pt"),
        "disc", template.opt_disc, stage=stage, cfg=model_cfg,
    )

    state = template._replace(
        gen_params=gen_params,
        disc_params=disc_params,
        opt_gen=opt_gen,
        opt_disc=opt_disc,
        iter_idx=jnp.asarray(
            save_idx * 1000 if iter_idx is None else iter_idx, jnp.int32
        ),
        gen_ema=(
            jax.tree_util.tree_map(jnp.copy, gen_params)
            if template.gen_ema is not None
            else None
        ),
    )

    # Grower counters: start of the stage's steady phase (alpha == 1).
    # The reference cannot tell us where inside the stage the save landed
    # (its .pt files carry no counters), so the documented convention is
    # "resume fully faded-in at the saved stage".
    grower = Grower(
        max_stage=train_cfg.max_stage,
        fadein_lengths=train_cfg.fadein_lengths,
        train_lengths=train_cfg.train_lengths,
    )
    grower.curr_grow = stage
    grower.step_sample_idx = grower.fadein_lengths[stage]
    grower.sample_idx = (
        grower._cum_train[stage - 1] if stage > 0 else 0
    ) + grower.step_sample_idx

    import dataclasses

    mgr = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    mgr.save(
        0,
        state,
        {
            # same key set the train loop's meta_dict writes, so eval /
            # resume tooling reads imported saves identically
            "iter_idx": int(state.iter_idx),
            "grower": grower.state_dict(),
            "saver_counter": 0,
            "epoch": 0,
            "epoch_batch_pos": 0,
            "train_cfg": dataclasses.asdict(train_cfg),
            "imported_from": os.path.abspath(ref_dir),
            "imported_save_idx": save_idx,
        },
    )
    return state, stage


def load_reference_discriminator(
    path: str,
    cfg: ModelConfig = ModelConfig(),
    stage: int | None = None,
) -> dict:
    """Load a reference discriminator ``state_dict`` into our pytree."""
    sd = _load_state_dict(path)
    params = init_discriminator(jax.random.PRNGKey(0), cfg)

    for i in range(len(cfg.disc_channels)):
        pre = f"_Discriminator__conv_blocks.{i}"
        if f"{pre}.0.weight" not in sd:
            break
        params["blocks"][i] = {
            "conv1": _conv(sd, f"{pre}.0"),
            "conv2": _conv(sd, f"{pre}.3"),
        }

    head = _conv(sd, "_Discriminator__start_block.0")
    if stage is None:
        cout = head["w"].shape[3]
        stage = next(
            s for s, (cin, _) in enumerate(cfg.disc_channels) if cin == cout
        )
    params["heads"][stage] = head
    if "_Discriminator__last_start_block.1.0.weight" in sd:
        params["heads"][stage + 1] = _conv(
            sd, "_Discriminator__last_start_block.1.0"
        )

    lin_w = sd["_Discriminator__clf.0.weight"]  # (out, in)
    params["clf"] = {
        "w": jnp.asarray(lin_w.T),
        "b": jnp.asarray(sd["_Discriminator__clf.0.bias"]),
    }
    return params
