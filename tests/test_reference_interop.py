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
