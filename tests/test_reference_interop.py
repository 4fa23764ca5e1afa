"""Interop proven against the REFERENCE'S OWN network classes.

Round 2 validated checkpoint ingest/export only against this repo's loader
plus independently-written torch fixtures; a key-name or Sequential-index
slip (e.g. ``__gen_blocks.{i}.4`` vs ``.3``) would have passed those tests
and failed real interop.  Here the actual ``music_gan.networks`` classes
are imported from ``/root/reference`` (the subpackage-import trick from
``scripts/measure_reference.py:31-48`` — called, not copied) and:

* our ``export`` output is loaded with ``Generator(32,
  end_layer=7).load_state_dict(..., strict=True)`` — the exact semantics
  of reference ``generate.py:29-38`` — and forward parity is asserted;
* a reference-initialized ``Generator``/``Discriminator`` state_dict is
  ingested by our loaders and forward parity is asserted the other way.
"""

import os
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from musicgan_tpu.config import ModelConfig
from musicgan_tpu.models import (
    discriminator_forward,
    generator_forward,
    init_generator,
)
from musicgan_tpu.models.torch_ingest import (
    export_reference_generator,
    load_reference_discriminator,
    load_reference_generator,
)

CFG = ModelConfig()

_REF = "/root/reference/music_gan"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference checkout not available"
)


def _import_reference_subpackage(name: str):
    """Import ``music_gan.<name>`` without executing the package
    ``__init__`` (which pulls in mlflow/torchvision, absent here)."""
    import importlib
    import importlib.util

    if "music_gan" not in sys.modules:
        spec = importlib.util.spec_from_file_location(
            "music_gan",
            os.path.join(_REF, "__init__.py"),
            submodule_search_locations=[_REF],
        )
        pkg = importlib.util.module_from_spec(spec)
        sys.modules["music_gan"] = pkg  # registered, NOT executed
    return importlib.import_module(f"music_gan.{name}")


def test_export_loads_into_reference_generator_class(tmp_path):
    """Our export drives the reference's own fully-grown Generator
    (reference ``generate.py:29-38``): strict state_dict load + forward
    parity."""
    networks = _import_reference_subpackage("networks")

    params = init_generator(jax.random.PRNGKey(11), CFG)
    pt = str(tmp_path / "exported.pt")
    export_reference_generator(params, pt, stage=7)

    gen = networks.Generator(CFG.rand_channels, end_layer=7)
    missing, unexpected = gen.load_state_dict(
        torch.load(pt, map_location="cpu", weights_only=True), strict=True
    )
    assert not missing and not unexpected
    gen.eval()

    z_np = (
        np.random.default_rng(0)
        .standard_normal((1, CFG.rand_channels, 2, 2))
        .astype(np.float32)
    )
    for alpha in (1.0, 0.5):
        with torch.no_grad():
            golden = gen(torch.from_numpy(z_np), alpha).numpy()
        ours = generator_forward(
            params, jnp.asarray(z_np.transpose(0, 2, 3, 1)), 7, alpha, CFG
        )
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=3e-5
        )


def test_reference_generator_state_dict_ingest(tmp_path):
    """Reverse direction: a reference-class Generator's own state_dict
    (fresh torch init, mid-growth topology) ingested by our loader."""
    networks = _import_reference_subpackage("networks")

    torch.manual_seed(3)
    stage = 3
    gen = networks.Generator(CFG.rand_channels, end_layer=stage)
    gen.eval()
    pt = str(tmp_path / "ref_gen.pt")
    torch.save(gen.state_dict(), pt)

    params = load_reference_generator(pt, CFG)  # stage inferred
    z_np = (
        np.random.default_rng(1)
        .standard_normal((2, CFG.rand_channels, 2, 2))
        .astype(np.float32)
    )
    alpha = 0.3
    with torch.no_grad():
        golden = gen(torch.from_numpy(z_np), alpha).numpy()
    ours = generator_forward(
        params, jnp.asarray(z_np.transpose(0, 2, 3, 1)), stage, alpha, CFG
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), golden, atol=3e-5
    )


def test_reference_discriminator_state_dict_ingest(tmp_path):
    """A reference-class Discriminator grown to full resolution (so the
    wrapped ``__last_start_block`` exists, reference
    ``discriminator.py:126-147``) ingested by our loader."""
    networks = _import_reference_subpackage("networks")

    torch.manual_seed(4)
    disc = networks.Discriminator(start_layer=1)
    assert disc.next_layer()  # -> start_layer 0 with a last_start_block
    disc.eval()
    pt = str(tmp_path / "ref_disc.pt")
    torch.save(disc.state_dict(), pt)

    params = load_reference_discriminator(pt, CFG)
    x_np = (
        np.random.default_rng(2)
        .uniform(-1, 1, (1, 2, 512, 512))
        .astype(np.float32)
    )
    alpha = 0.4
    with torch.no_grad():
        golden = disc(torch.from_numpy(x_np), alpha).numpy()
    ours = discriminator_forward(
        params, jnp.asarray(x_np.transpose(0, 2, 3, 1)), 0, alpha, CFG
    )
    np.testing.assert_allclose(np.asarray(ours), golden, atol=5e-4)


def _import_reference_audio_functions():
    """Import the reference's ``music_gan.audio.functions`` with the one
    dependency this environment lacks — torchaudio — emulated by its
    torch-core equivalent.  ``torchaudio.functional.inverse_spectrogram``
    (normalized=True) is exactly ``torch.istft`` after undoing the
    1/sqrt(sum(win^2)) scaling (the equivalence tests/test_stft.py pins
    against goldens), and ``torchaudio.save`` is captured in-memory so the
    comparison sees the reference's full-precision waveform.  Everything
    else in reference ``audio/functions.py`` — including the serial phase
    cumsum loop (``:117-118``) — executes as written."""
    import types

    captured = {}
    ta = types.ModuleType("torchaudio")
    taf = types.ModuleType("torchaudio.functional")

    def inverse_spectrogram(
        z, length, pad, window, n_fft, hop_length, win_length, normalized
    ):
        assert normalized and pad == 0 and length is None
        zt = z * window.pow(2).sum().sqrt()
        return torch.istft(
            zt,
            n_fft=n_fft,
            hop_length=hop_length,
            win_length=win_length,
            window=window,
            center=True,
            normalized=False,
            onesided=True,
        )

    taf.inverse_spectrogram = inverse_spectrogram
    ta.functional = taf
    ta.save = lambda path, wav, sr: captured.update(
        path=path, wav=wav.detach().numpy(), sr=sr
    )
    # Install the stubs UNCONDITIONALLY (not setdefault): in an
    # environment where real torchaudio exists, setdefault would keep it,
    # the stubbed `ta.save` would never run, and `captured` would stay
    # empty — the test must behave identically everywhere.  The reference
    # module binds the stub objects at import, so sys.modules can be
    # restored right after the import.
    prev = {n: sys.modules.get(n)
            for n in ("torchaudio", "torchaudio.functional")}
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.functional"] = taf
    try:
        # Force a fresh import so the module binds THIS call's stub (and
        # thus this call's `captured`), even if a previous call cached it.
        sys.modules.pop("music_gan.audio.functions", None)
        sys.modules.pop("music_gan.audio", None)
        mod = _import_reference_subpackage("audio.functions")
    finally:
        for name, old in prev.items():
            if old is None:
                sys.modules.pop(name, None)
            else:
                sys.modules[name] = old
    return mod, captured


def test_waveform_parity_with_reference_generate_path(tmp_path):
    """BASELINE.md target row 4 in its achievable form: ONE latent, the
    SAME trained checkpoint (the shipped r3 artifact), driven through

    * the reference's own path — ``networks.Generator`` forward then the
      reference's real ``magn_phase_to_wav`` (``generate.py:54-65`` +
      ``audio/functions.py:97-139``), and
    * production ``musicgan_tpu.generate`` (single-graph G + vocoder),

    and the resulting WAV compared sample-by-sample.  Error budget: both
    vocoders are f32; the differences are matmul-DFT vs FFT iSTFT and
    parallel-prefix vs serial phase accumulation — measured headroom is
    ~1e-5, asserted at 1e-4 of a [-1,1]-scale waveform."""
    networks = _import_reference_subpackage("networks")
    ref_fns, captured = _import_reference_audio_functions()

    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "saved_models", "quality_r3", "gen_final.pt",
    )
    if not os.path.isfile(ckpt):
        pytest.skip("trained artifact not present")

    nb_vec = 1
    z_np = (
        np.random.default_rng(7)
        .standard_normal((1, CFG.rand_channels, 2, 2 * nb_vec))
        .astype(np.float32)
    )

    # --- reference path (their classes, their functions) ----------------
    gen = networks.Generator(CFG.rand_channels, end_layer=7)
    gen.load_state_dict(
        torch.load(ckpt, map_location="cpu", weights_only=True), strict=True
    )
    gen.eval()
    with torch.no_grad():
        img = gen(torch.from_numpy(z_np), 1.0)
    ref_fns.magn_phase_to_wav(img, str(tmp_path / "ref.wav"), 44100)
    ref_wave = captured["wav"].squeeze()

    # --- our path: the production generate() workflow -------------------
    from musicgan_tpu.audio.io import load_wav
    from musicgan_tpu.generate import generate

    (path,) = generate(
        str(tmp_path / "ours"),
        CFG.rand_channels,
        ckpt,
        nb_vec=nb_vec,
        nb_music=1,
        z=z_np.transpose(0, 2, 3, 1),
    )
    our_wave, sr = load_wav(path)
    assert sr == 44100

    assert our_wave.shape == ref_wave.shape
    # guard against a degenerate all-zero pass
    assert float(np.max(np.abs(ref_wave))) > 1e-3
    np.testing.assert_allclose(our_wave, ref_wave, atol=1e-4, rtol=0)


# ---------------------------------------------------------------------------
# Full-save interop: the reference's Saver writes FOUR files per save
# (gen/disc/optim_gen/optim_disc _{i}.pt, reference utils.py:118-145).
# These tests prove our export of all four loads into a training setup
# built EXACTLY as the reference's train.py builds it (Adam over the
# initial parameters(), add_param_group per growth, train.py:64-69,262-272)
# — and the reverse: a genuine reference save directory imported as a
# native run that `train --resume` continues.
# ---------------------------------------------------------------------------


def _fabricate_adam(params, active_paths, seed):
    """A PerLeafAdamState with random moments everywhere and nonzero step
    counts only on ``active_paths`` — the shape a real run has (inactive
    stages get zero grads, so their counts stay 0 and torch's lazy state
    has no entry)."""
    from musicgan_tpu.train.optim import PerLeafAdamState

    rng = np.random.default_rng(seed)
    mu = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape).astype(np.float32)),
        params,
    )
    nu = jax.tree_util.tree_map(
        lambda p: jnp.asarray(
            np.abs(rng.standard_normal(p.shape)).astype(np.float32)
        ),
        params,
    )
    count = jax.tree_util.tree_map(
        lambda p: np.zeros((), np.int32), params
    )
    for path, val in active_paths:
        t = count
        for q in path[:-1]:
            t = t[q]
        t[path[-1]] = np.asarray(val, np.int32)
    return PerLeafAdamState(
        count=jax.tree_util.tree_map(jnp.asarray, count), mu=mu, nu=nu
    )


def _gen_active(stage):
    paths = []
    for i in range(stage + 1):
        for conv in ("conv1", "conv2"):
            paths += [(("blocks", i, conv, "w"), 100 + i),
                      (("blocks", i, conv, "b"), 100 + i)]
    for s in range(stage + 1):
        paths += [(("heads", s, "w"), 7 + s), (("heads", s, "b"), 7 + s)]
    return paths


def _disc_active(layer, n_blocks=9):
    paths = [(("clf", "w"), 50), (("clf", "b"), 50)]
    for i in range(layer, n_blocks):
        for conv in ("conv1", "conv2"):
            paths += [(("blocks", i, conv, "w"), 60 + i),
                      (("blocks", i, conv, "b"), 60 + i)]
    for h in range(layer, n_blocks - 1):
        paths += [(("heads", h, "w"), 9 + h), (("heads", h, "b"), 9 + h)]
    return paths


def test_full_save_loads_into_reference_training_setup(tmp_path):
    """export --full output drives the reference's OWN training objects:
    models via strict load_state_dict, and optimizer state_dicts accepted
    by torch.optim.Adam instances whose param groups were grown exactly
    like train.py grows them — then torch's own name->param mapping
    verifies each moment tensor landed on the right parameter."""
    from musicgan_tpu.models import init_discriminator
    from musicgan_tpu.models.torch_ingest import export_reference_save
    from musicgan_tpu.train.step import TrainState

    stage = 2
    layer = len(CFG.disc_channels) - 2 - stage  # reference curr_layer = 5
    gen_params = init_generator(jax.random.PRNGKey(21), CFG)
    disc_params = init_discriminator(jax.random.PRNGKey(22), CFG)
    opt_gen = _fabricate_adam(gen_params, _gen_active(stage), 23)
    opt_disc = _fabricate_adam(disc_params, _disc_active(layer), 24)
    state = TrainState(
        gen_params=gen_params, disc_params=disc_params,
        opt_gen=opt_gen, opt_disc=opt_disc,
        rng=jax.random.PRNGKey(0), iter_idx=jnp.zeros((), jnp.int32),
    )
    export_reference_save(state, str(tmp_path), 7, stage=stage, cfg=CFG)

    networks = _import_reference_subpackage("networks")
    lr, betas = 1e-3, (0.0, 0.9)

    # --- build the training objects exactly as reference train.py does ---
    gen = networks.Generator(CFG.rand_channels, end_layer=0)
    optim_gen = torch.optim.Adam(gen.parameters(), lr=lr, betas=betas)
    disc = networks.Discriminator(start_layer=7)
    optim_disc = torch.optim.Adam(disc.parameters(), lr=lr, betas=betas)
    for _ in range(stage):
        assert gen.next_layer() and disc.next_layer()
        optim_gen.add_param_group(
            {"params": gen.end_block_params(), "lr": lr, "betas": betas}
        )
        optim_disc.add_param_group(
            {"params": disc.start_block_parameters(), "lr": lr,
             "betas": betas}
        )

    def _load(path, weights_only=True):
        return torch.load(str(tmp_path / path), map_location="cpu",
                          weights_only=weights_only)

    missing, unexpected = gen.load_state_dict(_load("gen_7.pt"), strict=True)
    assert not missing and not unexpected
    missing, unexpected = disc.load_state_dict(_load("disc_7.pt"),
                                               strict=True)
    assert not missing and not unexpected
    optim_gen.load_state_dict(_load("optim_gen_7.pt", weights_only=False))
    optim_disc.load_state_dict(_load("optim_disc_7.pt", weights_only=False))

    # --- torch's name->param mapping is the ground truth for ordinals ---
    named_g = dict(gen.named_parameters())
    st = optim_gen.state[named_g["_Generator__gen_blocks.1.0.weight"]]
    np.testing.assert_allclose(
        st["exp_avg"].numpy(),
        np.transpose(np.asarray(opt_gen.mu["blocks"][1]["conv1"]["w"]),
                     (3, 2, 0, 1)),
    )
    assert int(st["step"]) == 101
    st = optim_gen.state[named_g["_Generator__end_block.0.weight"]]
    np.testing.assert_allclose(
        st["exp_avg"].numpy(),
        np.transpose(np.asarray(opt_gen.mu["heads"][stage]["w"]),
                     (3, 2, 0, 1)),
    )
    st = optim_gen.state[named_g["_Generator__last_end_block.0.0.weight"]]
    np.testing.assert_allclose(
        st["exp_avg_sq"].numpy(),
        np.transpose(np.asarray(opt_gen.nu["heads"][stage - 1]["w"]),
                     (3, 2, 0, 1)),
    )
    # inactive block (never grown past): no lazy state entry
    assert named_g["_Generator__gen_blocks.6.0.weight"] not in optim_gen.state

    named_d = dict(disc.named_parameters())
    st = optim_disc.state[named_d["_Discriminator__start_block.0.weight"]]
    np.testing.assert_allclose(
        st["exp_avg"].numpy(),
        np.transpose(np.asarray(opt_disc.mu["heads"][layer]["w"]),
                     (3, 2, 0, 1)),
    )
    assert int(st["step"]) == 9 + layer
    st = optim_disc.state[named_d["_Discriminator__clf.0.weight"]]
    np.testing.assert_allclose(
        st["exp_avg"].numpy(), np.asarray(opt_disc.mu["clf"]["w"]).T
    )

    # --- and the loaded optimizers actually step -------------------------
    z = torch.randn(2, CFG.rand_channels, 2, 2)
    gen(z, 1.0).mean().backward()
    optim_gen.step()  # would raise on any state/param shape mismatch


def test_reference_adam_roundtrip(tmp_path):
    """export_reference_adam -> load_reference_adam is the identity on
    every leaf (active moments and counts recovered; inactive leaves back
    to zero state)."""
    from musicgan_tpu.models.torch_ingest import (
        export_reference_adam,
        load_reference_adam,
    )
    from musicgan_tpu.train.optim import adam_per_leaf

    stage = 4
    gen_params = init_generator(jax.random.PRNGKey(31), CFG)
    ours = _fabricate_adam(gen_params, _gen_active(stage), 33)
    pt = str(tmp_path / "optim_gen_0.pt")
    export_reference_adam(ours, pt, "gen", stage=stage, cfg=CFG)

    template = adam_per_leaf(1e-3, b1=0.0, b2=0.9).init(gen_params)
    back, inferred = load_reference_adam(pt, "gen", template, cfg=CFG)
    assert inferred == stage

    flat_c, _ = jax.tree_util.tree_flatten(ours.count)
    flat_c2, _ = jax.tree_util.tree_flatten(back.count)
    for a, b in zip(flat_c, flat_c2):
        assert int(a) == int(b)
    for which in ("mu", "nu"):
        for a, b, c in zip(
            jax.tree_util.tree_leaves(getattr(ours, which)),
            jax.tree_util.tree_leaves(getattr(back, which)),
            flat_c,
        ):
            if int(c) > 0:
                np.testing.assert_allclose(np.asarray(a), np.asarray(b))
            else:
                assert not np.any(np.asarray(b))  # inactive -> zero state


def test_import_reference_run_resumes_training(tmp_path):
    """A GENUINE reference save directory (reference classes + real torch
    Adam steps at stage 0) imported via import_reference_run, then the
    run CONTINUED by our production train(..., resume=True) — a workflow
    the reference itself never had."""
    import dataclasses

    from musicgan_tpu.config import TrainConfig
    from musicgan_tpu.models.torch_ingest import import_reference_run
    from musicgan_tpu.train import train
    from musicgan_tpu.train.checkpoint import CheckpointManager

    networks = _import_reference_subpackage("networks")
    torch.manual_seed(9)
    lr, betas = 1e-3, (0.0, 0.9)
    gen = networks.Generator(CFG.rand_channels, end_layer=0)
    disc = networks.Discriminator(start_layer=7)
    optim_gen = torch.optim.Adam(gen.parameters(), lr=lr, betas=betas)
    optim_disc = torch.optim.Adam(disc.parameters(), lr=lr, betas=betas)

    # two real mini training steps (stage 0: 4x4 images) so the Adam
    # states carry genuine lazily-initialized entries
    for _ in range(2):
        x_real = torch.rand(2, 2, 4, 4) * 2 - 1
        z = torch.randn(2, CFG.rand_channels, 2, 2)
        optim_disc.zero_grad()
        (disc(gen(z, 1.0).detach(), 1.0).mean()
         - disc(x_real, 1.0).mean()).backward()
        optim_disc.step()
        optim_gen.zero_grad()
        (-disc(gen(z, 1.0), 1.0).mean()).backward()
        optim_gen.step()

    ref_dir = tmp_path / "ref_save"
    ref_dir.mkdir()
    torch.save(gen.state_dict(), str(ref_dir / "gen_3.pt"))
    torch.save(disc.state_dict(), str(ref_dir / "disc_3.pt"))
    torch.save(optim_gen.state_dict(), str(ref_dir / "optim_gen_3.pt"))
    torch.save(optim_disc.state_dict(), str(ref_dir / "optim_disc_3.pt"))

    run_dir = str(tmp_path / "run")
    fast = TrainConfig(batch_size=4, save_every=50, log_every=2,
                       nb_preview=1, chunk_steps=1)
    state, stage = import_reference_run(
        str(ref_dir), 3, run_dir, model_cfg=CFG, train_cfg=fast,
    )
    assert stage == 0
    assert int(state.iter_idx) == 3000  # save_idx * reference save cadence

    # the ingested moments match torch's (spot-check an active conv)
    p = dict(gen.named_parameters())["_Generator__gen_blocks.0.0.weight"]
    np.testing.assert_allclose(
        np.asarray(state.opt_gen.mu["blocks"][0]["conv1"]["w"]),
        np.transpose(optim_gen.state[p]["exp_avg"].numpy(), (2, 3, 1, 0)),
        atol=1e-7,
    )
    # a block the reference never reached stays count 0
    assert int(state.opt_gen.count["blocks"][5]["conv1"]["w"]) == 0
    assert int(state.opt_gen.count["blocks"][0]["conv1"]["w"]) == 2

    # --- continue the run with the production loop ----------------------
    ds = _interop_synth_dataset(tmp_path)
    out = train("cont", ds, run_dir, fast, CFG, resume=True,
                max_iters=3003, mesh=None)
    assert int(out.iter_idx) == 3003
    mgr = CheckpointManager(os.path.join(run_dir, "checkpoints"))
    assert mgr.latest() is not None


def _interop_synth_dataset(tmp_path, n=8):
    from musicgan_tpu.audio.ingest import ShardWriter

    w = ShardWriter(str(tmp_path / "interop_ds"), samples_per_shard=4)
    rng = np.random.default_rng(5)
    w.add(rng.uniform(-1, 1, (n, 2, 512, 512)).astype(np.float32))
    w.close()
    return str(tmp_path / "interop_ds")
