"""Generate-path and reference-checkpoint-ingest tests.

The ingest parity fixture builds an *independent* PyTorch model following the
reference's published architecture spec (SURVEY.md §2.2) with random weights,
exports a reference-format name-mangled ``state_dict``, and asserts our JAX
forward reproduces the torch forward — validating conv semantics, layout
transposes, and key mapping end to end (BASELINE.md config 2).
"""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from musicgan_tpu.config import ModelConfig
from musicgan_tpu.models import generator_forward, discriminator_forward
from musicgan_tpu.models.torch_ingest import (
    load_reference_discriminator,
    load_reference_generator,
)

CFG = ModelConfig()


# ------------------------------------------------------------------------
# torch fixture models (architecture spec from SURVEY.md §2.2, independent
# implementation for golden-value generation only)
# ------------------------------------------------------------------------

class TorchGenBlock(torch.nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.c1 = torch.nn.Conv2d(cin, cin, 3, 1, 1)
        self.c2 = torch.nn.Conv2d(cin, cout, 3, 1, 1)

    def forward(self, x):
        def pn(t):
            return t / torch.sqrt(t.pow(2).mean(dim=1, keepdim=True) + 1e-8)

        x = pn(torch.nn.functional.leaky_relu(self.c1(x), 0.2))
        x = torch.nn.functional.interpolate(x, scale_factor=2.0, mode="nearest")
        x = pn(torch.nn.functional.leaky_relu(self.c2(x), 0.2))
        return x


def _torch_generator(stage):
    torch.manual_seed(0)
    blocks = [TorchGenBlock(cin, cout) for cin, cout in CFG.gen_channels]
    head = torch.nn.Conv2d(CFG.gen_channels[stage][1], 2, 1)
    old_head = (
        torch.nn.Conv2d(CFG.gen_channels[stage - 1][1], 2, 1)
        if stage > 0
        else None
    )
    return blocks, head, old_head


def _torch_gen_forward(blocks, head, old_head, z, stage, alpha):
    out = z
    for i in range(stage):
        out = blocks[i](out)
    out_block = blocks[stage](out)
    new = torch.tanh(head(out_block))
    if old_head is not None:
        old = torch.nn.functional.interpolate(
            torch.tanh(old_head(out)), scale_factor=2.0, mode="nearest"
        )
        return alpha * new + (1 - alpha) * old
    return new


def _export_reference_gen_sd(blocks, head, old_head):
    sd = {}
    for i, b in enumerate(blocks):
        sd[f"_Generator__gen_blocks.{i}.0.weight"] = b.c1.weight.detach()
        sd[f"_Generator__gen_blocks.{i}.0.bias"] = b.c1.bias.detach()
        sd[f"_Generator__gen_blocks.{i}.4.weight"] = b.c2.weight.detach()
        sd[f"_Generator__gen_blocks.{i}.4.bias"] = b.c2.bias.detach()
    sd["_Generator__end_block.0.weight"] = head.weight.detach()
    sd["_Generator__end_block.0.bias"] = head.bias.detach()
    if old_head is not None:
        sd["_Generator__last_end_block.0.0.weight"] = old_head.weight.detach()
        sd["_Generator__last_end_block.0.0.bias"] = old_head.bias.detach()
    return sd


@pytest.mark.parametrize("stage,alpha", [(7, 1.0), (3, 0.3)])
def test_generator_ingest_forward_parity(tmp_path, stage, alpha):
    blocks, head, old_head = _torch_generator(stage)
    sd = _export_reference_gen_sd(blocks, head, old_head)
    pt = str(tmp_path / "gen.pt")
    torch.save(sd, pt)

    params = load_reference_generator(pt, CFG)  # stage inferred
    z_np = np.random.default_rng(0).standard_normal((2, 32, 2, 2)).astype(np.float32)

    with torch.no_grad():
        golden = _torch_gen_forward(
            blocks, head, old_head, torch.from_numpy(z_np), stage, alpha
        ).numpy()

    ours = generator_forward(
        params, jnp.asarray(z_np.transpose(0, 2, 3, 1)), stage, alpha, CFG
    )
    ours = np.asarray(ours).transpose(0, 3, 1, 2)  # NHWC -> NCHW
    np.testing.assert_allclose(ours, golden, atol=2e-5)


def test_discriminator_ingest_forward_parity(tmp_path):
    torch.manual_seed(1)
    stage = 0  # fully grown

    convs = []
    sd = {}
    for i, (cin, cout) in enumerate(CFG.disc_channels):
        c1 = torch.nn.Conv2d(cin, cout, 3, 1, 1)
        c2 = torch.nn.Conv2d(cout, cout, 3, 1, 1)
        convs.append((c1, c2))
        sd[f"_Discriminator__conv_blocks.{i}.0.weight"] = c1.weight.detach()
        sd[f"_Discriminator__conv_blocks.{i}.0.bias"] = c1.bias.detach()
        sd[f"_Discriminator__conv_blocks.{i}.3.weight"] = c2.weight.detach()
        sd[f"_Discriminator__conv_blocks.{i}.3.bias"] = c2.bias.detach()
    head = torch.nn.Conv2d(2, CFG.disc_channels[stage][0], 1)
    old_head = torch.nn.Conv2d(2, CFG.disc_channels[stage + 1][0], 1)
    clf = torch.nn.Linear(CFG.disc_channels[-1][1], 1)
    sd["_Discriminator__start_block.0.weight"] = head.weight.detach()
    sd["_Discriminator__start_block.0.bias"] = head.bias.detach()
    sd["_Discriminator__last_start_block.1.0.weight"] = old_head.weight.detach()
    sd["_Discriminator__last_start_block.1.0.bias"] = old_head.bias.detach()
    sd["_Discriminator__clf.0.weight"] = clf.weight.detach()
    sd["_Discriminator__clf.0.bias"] = clf.bias.detach()
    pt = str(tmp_path / "disc.pt")
    torch.save(sd, pt)

    params = load_reference_discriminator(pt, CFG)

    alpha = 0.4

    def lrelu(t):
        return torch.nn.functional.leaky_relu(t, 0.2)

    def t_block(i, t):
        c1, c2 = convs[i]
        return lrelu(c2(torch.nn.functional.avg_pool2d(lrelu(c1(t)), 2)))

    x_np = (
        np.random.default_rng(0).uniform(-1, 1, (1, 2, 512, 512)).astype(np.float32)
    )
    with torch.no_grad():
        xt = torch.from_numpy(x_np)
        new = t_block(0, lrelu(head(xt)))
        old = lrelu(old_head(torch.nn.functional.avg_pool2d(xt, 2)))
        out = alpha * new + (1 - alpha) * old
        for i in range(1, len(convs)):
            out = t_block(i, out)
        golden = clf(out.flatten(1)).numpy()

    ours = discriminator_forward(
        params, jnp.asarray(x_np.transpose(0, 2, 3, 1)), 0, alpha, CFG
    )
    np.testing.assert_allclose(np.asarray(ours), golden, atol=3e-4)


def test_generate_workflow_end_to_end(tmp_path):
    """Full CLI-equivalent generate run from a reference-format checkpoint."""
    from musicgan_tpu.generate import generate

    blocks, head, old_head = _torch_generator(7)
    sd = _export_reference_gen_sd(blocks, head, old_head)
    pt = str(tmp_path / "gen_419.pt")
    torch.save(sd, pt)

    out = str(tmp_path / "sounds")
    paths = generate(out, 32, pt, nb_vec=1, nb_music=2, seed=0)
    assert len(paths) == 2
    from musicgan_tpu.audio.io import load_wav

    for p in paths:
        sig, sr = load_wav(p)
        assert sr == 44100
        assert sig.shape == ((512 - 1) * 256,)
        assert np.isfinite(sig).all() and np.abs(sig).max() > 0


def test_export_import_roundtrip(tmp_path):
    """Our pytree -> reference .pt -> our pytree is the identity (for the
    blocks and active heads)."""
    from musicgan_tpu.models import init_generator
    from musicgan_tpu.models.torch_ingest import (
        export_reference_generator,
        load_reference_generator,
    )

    params = init_generator(jax.random.PRNGKey(5), CFG)
    pt = str(tmp_path / "exported.pt")
    export_reference_generator(params, pt, stage=7)
    back = load_reference_generator(pt, CFG)

    for i in range(8):
        for k in ("conv1", "conv2"):
            np.testing.assert_array_equal(
                np.asarray(params["blocks"][i][k]["w"]),
                np.asarray(back["blocks"][i][k]["w"]),
            )
    for h in (6, 7):
        np.testing.assert_array_equal(
            np.asarray(params["heads"][h]["w"]), np.asarray(back["heads"][h]["w"])
        )


def test_generate_from_partial_stage_checkpoint():
    """Audio can be auditioned from any growth stage (the image is
    upsampled to full spectrogram resolution before vocoding)."""
    from musicgan_tpu.generate import synthesize_fn
    from musicgan_tpu.models import init_generator

    params = init_generator(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 32))
    for stage in (3, 7):
        wave = synthesize_fn(CFG, stage)(params, z)
        assert wave.shape == (1, (512 - 1) * 256)
        assert np.isfinite(np.asarray(wave)).all()

def test_synthesize_fn_jittable_under_outer_jit_on_cache_miss(
    monkeypatch, tmp_path
):
    """The driver compile-checks ``entry()`` by wrapping its fn in an
    OUTER jax.jit.  Nested jits are inlined into the outer trace, so if
    the autotuner hits a cache miss there it must NOT run its timing
    harness (whose eager dispatches would become tracers and crash) —
    it must fall back trace-safely (persisted winner, else "xla")."""
    from musicgan_tpu.generate import synthesize_fn
    from musicgan_tpu.models import init_generator
    from musicgan_tpu.ops import autotune

    # Empty persisted table + empty in-memory cache + a non-cpu backend
    # label (the CPU short-circuit would otherwise hide the bug), and
    # measurement functions that fail the test if ever invoked.
    monkeypatch.setenv("MUSICGAN_AUTOTUNE_DIR", str(tmp_path))
    monkeypatch.setattr(autotune, "_CACHE", {})
    monkeypatch.setattr(autotune.jax, "default_backend", lambda: "tpu")

    def _boom(*a, **k):
        raise AssertionError("autotune measured inside an outer trace")

    monkeypatch.setattr(autotune, "measure_conv_impls", _boom)
    monkeypatch.setattr(autotune, "measure_train_impls", _boom)

    fn = synthesize_fn(CFG, stage=3)
    params = init_generator(jax.random.PRNGKey(0), CFG)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 2, 32))
    jax.jit(fn).lower(params, z)  # must trace cleanly, no measurement

    # Eager calls (no ambient trace) still measure-and-cache: restore the
    # real backend label so resolution takes the CPU short-circuit and
    # assert the winner table stays unpolluted by the traced fallback.
    assert not autotune._CACHE


def test_resolve_istft_impl_cpu_and_trace_safe():
    """CPU backend always gets the XLA vocoder lowering (interpreted
    Pallas is orders slower), and the trace-safe mode never measures."""
    from musicgan_tpu.ops.autotune import resolve_istft_impl

    assert resolve_istft_impl(10240) == "xla"
    assert resolve_istft_impl(10240, allow_measure=False) == "xla"
