"""Periodic checkpoint + preview-image saver (reference ``utils.py:89-242``).

Every ``save_every`` train iterations: write a full-resume checkpoint (the
reference writes load-only state dicts) and render ``nb_preview``
magnitude/phase PNG pairs ('plasma' colormap, matching the reference's
preview style at ``utils.py:147-207``) from fresh latents through the
current-stage generator.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..config import ModelConfig, TrainConfig
from ..models import generator_forward
from .checkpoint import CheckpointManager
from .step import TrainState

__all__ = ["Saver"]


class Saver:
    def __init__(
        self,
        output_dir: str,
        train_cfg: TrainConfig = TrainConfig(),
        model_cfg: ModelConfig = ModelConfig(),
    ):
        os.makedirs(output_dir, exist_ok=True)
        self.output_dir = output_dir
        self.cfg = train_cfg
        self.model_cfg = model_cfg
        self.ckpt = CheckpointManager(os.path.join(output_dir, "checkpoints"))
        self.counter = 0
        self.curr_save = 0
        self._preview_key = jax.random.PRNGKey(train_cfg.seed + 777)
        # Per-instance jit cache (an lru_cache on the method would key on
        # ``self`` and pin every Saver + its graphs for the process life).
        self._preview_fns: dict[int, object] = {}

    def _preview_fwd(self, stage: int):
        if stage not in self._preview_fns:
            cfg = self.model_cfg

            @jax.jit
            def fwd(params, z, alpha):
                return generator_forward(params, z, stage, alpha, cfg)

            self._preview_fns[stage] = fwd
        return self._preview_fns[stage]

    def _save_previews(self, state: TrainState, stage: int, alpha: float):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        cfg = self.model_cfg
        fwd = self._preview_fwd(stage)
        # Previews render what generate/export would ship: the EMA weights
        # when the run carries them (TrainConfig.ema_decay > 0).
        gen_params = (
            state.gen_ema if state.gen_ema is not None else state.gen_params
        )
        for gen_idx in range(self.cfg.nb_preview):
            self._preview_key, k = jax.random.split(self._preview_key)
            z = jax.random.normal(
                k, (1, cfg.latent_height, cfg.latent_width, cfg.rand_channels)
            )
            x = np.asarray(fwd(gen_params, z, alpha))  # (1, H, W, 2)
            for ch, name in ((0, "magn"), (1, "phase")):
                img = x[0, :, :, ch]
                fig, ax = plt.subplots()
                ax.matshow(img / (img.max() - img.min() + 1e-12), cmap="plasma")
                plt.title(f"gen {name} {self.curr_save} grow={stage}")
                fig.savefig(
                    os.path.join(
                        self.output_dir,
                        f"{name}_{self.curr_save}_ID{gen_idx}.png",
                    )
                )
                plt.close(fig)

    def request_save(
        self, state: TrainState, stage: int, alpha: float, meta: dict
    ) -> bool:
        """Call once per train iteration; fires every ``save_every`` calls
        (reference ``utils.py:209-233``)."""
        self.counter += 1
        if self.counter % self.cfg.save_every != 0:
            return False
        self.ckpt.save(
            self.curr_save,
            state,
            {**meta, "saver_counter": self.counter, "save_idx": self.curr_save},
        )
        # Checkpointing is collective (orbax needs every process), previews
        # are not: only the lead process renders PNGs.
        if jax.process_index() == 0:
            self._save_previews(state, stage, alpha)
        self.curr_save += 1
        return True

    def save_now(
        self, state: TrainState, stage: int, alpha: float, meta: dict
    ) -> None:
        """Off-cadence checkpoint flush (preemption): same artifact as a
        cadence save; the cadence counter is untouched, so the next
        periodic save still fires on schedule."""
        self.ckpt.save(
            self.curr_save,
            state,
            {**meta, "saver_counter": self.counter, "save_idx": self.curr_save},
        )
        if jax.process_index() == 0:
            self._save_previews(state, stage, alpha)
        self.curr_save += 1

    @property
    def save_counter(self) -> int:
        return self.counter % self.cfg.save_every
