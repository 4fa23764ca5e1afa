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
