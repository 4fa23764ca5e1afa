"""Full train-state checkpointing WITH resume.

The reference saves four separate ``state_dict`` files every 1000 iterations
(reference ``utils.py:118-145``) but can never load them back into
``train()`` — training always restarts from stage 0 (``train.py:52-58``).
Here a checkpoint is the complete run state: parameter/optimizer pytrees
(orbax), plus grower counters, iteration index, and RNG — so ``--resume``
continues bit-where-it-left-off (modulo data order within an epoch).
"""

from __future__ import annotations

import json
import os
import re
from typing import Optional

import jax
import orbax.checkpoint as ocp

from .step import TrainState

__all__ = ["CheckpointManager"]

_STEP_RE = re.compile(r"^save_(\d+)$")


def resolve_checkpoint(ckpt: str) -> tuple[str, int]:
    """``(checkpoints_root, save_idx)`` from any of the checkpoint-path
    spellings the CLI accepts: a specific ``.../save_N`` dir, a
    ``.../checkpoints`` dir, or a run dir containing ``checkpoints/``
    (latest save in the latter two).  Shared by ``generate``/``export``
    so the resolution rules can't drift between subcommands."""
    ckpt = os.path.normpath(ckpt)  # tolerate trailing slashes
    m = _STEP_RE.match(os.path.basename(ckpt))
    if m:
        return os.path.dirname(ckpt), int(m.group(1))
    root = ckpt
    if os.path.isdir(os.path.join(ckpt, "checkpoints")):
        root = os.path.join(ckpt, "checkpoints")
    if not os.path.isdir(root):
        # constructing CheckpointManager would mkdir a typo'd path
        raise FileNotFoundError(f"checkpoint path does not exist: {root}")
    save_idx = CheckpointManager(root).latest()
    if save_idx is None:
        raise FileNotFoundError(f"no checkpoints under {root}")
    return root, save_idx


class CheckpointManager:
    """Directory layout: ``{root}/save_{k}/state`` (orbax pytree) +
    ``{root}/save_{k}/meta.json`` (host-side counters)."""

    def __init__(self, root: str):
        os.makedirs(root, exist_ok=True)
        self.root = os.path.abspath(root)
        self._ckptr = ocp.StandardCheckpointer()

    def _dir(self, save_idx: int) -> str:
        return os.path.join(self.root, f"save_{save_idx}")

    def save(self, save_idx: int, state: TrainState, meta: dict) -> str:
        d = self._dir(save_idx)
        # orbax save is collective (every process participates); the meta
        # sidecar is written once, by the lead process, after the state is
        # durable — meta.json's presence marks the checkpoint complete
        # (see saved_indices).
        self._ckptr.save(os.path.join(d, "state"), state, force=True)
        self._ckptr.wait_until_finished()
        if jax.process_index() == 0:
            # record the saved STRUCTURE so restore can shape its template
            # up front instead of probing with a failed restore
            meta = {**meta, "has_ema": state.gen_ema is not None}
            with open(os.path.join(d, "meta.json"), "w") as f:
                json.dump(meta, f, indent=1)
        return d

    def saved_indices(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            m = _STEP_RE.match(name)
            if m and os.path.isfile(os.path.join(self.root, name, "meta.json")):
                out.append(int(m.group(1)))
        return sorted(out)

    def latest(self) -> Optional[int]:
        idx = self.saved_indices()
        return idx[-1] if idx else None

    def restore(
        self, save_idx: int, template: TrainState
    ) -> tuple[TrainState, dict]:
        d = self._dir(save_idx)
        with open(os.path.join(d, "meta.json")) as f:
            meta = json.load(f)

        # Shape the template to the SAVED structure up front (meta records
        # it since r3).  Probing with a failed restore — the previous
        # approach — both masked genuine restore failures behind an
        # unrelated second structure error and made every EMA-off load of
        # an EMA-carrying run pay a guaranteed failed full restore.
        fixup = None
        has_ema = meta.get("has_ema")
        if has_ema is not None:
            if template.gen_ema is not None and not has_ema:
                # EMA-on resume of an EMA-less checkpoint: restore the
                # legacy structure, then seed the EMA from live weights.
                template = template._replace(gen_ema=None)
                fixup = lambda s: s._replace(  # noqa: E731
                    gen_ema=jax.tree_util.tree_map(
                        lambda x: x.copy(), s.gen_params
                    )
                )
            elif template.gen_ema is None and has_ema:
                # EMA-off template against an EMA-carrying checkpoint
                # (e.g. generate/export loading an ema_decay>0 run): ask
                # for the EMA subtree too, shaped like gen_params.
                template = template._replace(gen_ema=template.gen_params)
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template
            )
            state = self._ckptr.restore(os.path.join(d, "state"), abstract)
        else:
            # Checkpoint predates the has_ema marker: the saved structure
            # is unknown, so probe — try the template as-is, and retry once
            # with the opposite EMA structure on failure.
            abstract = jax.tree_util.tree_map(
                ocp.utils.to_shape_dtype_struct, template
            )
            try:
                state = self._ckptr.restore(
                    os.path.join(d, "state"), abstract
                )
            except Exception as first_err:
                if template.gen_ema is not None:
                    alt = template._replace(gen_ema=None)
                    fixup = lambda s: s._replace(  # noqa: E731
                        gen_ema=jax.tree_util.tree_map(
                            lambda x: x.copy(), s.gen_params
                        )
                    )
                else:
                    alt = template._replace(gen_ema=template.gen_params)
                abstract = jax.tree_util.tree_map(
                    ocp.utils.to_shape_dtype_struct, alt
                )
                try:
                    state = self._ckptr.restore(
                        os.path.join(d, "state"), abstract
                    )
                except Exception as second_err:
                    # A corrupt/partial checkpoint (not an EMA-structure
                    # mismatch) fails BOTH probes; chain to the first
                    # error so the real cause isn't buried under the
                    # retry's structure-mismatch noise (ADVICE r3).
                    raise second_err from first_err
        if not isinstance(state, TrainState):
            state = TrainState(*state)
        if fixup is not None:
            state = fixup(state)
        return state, meta
