"""Configuration dataclasses for the musicgan_tpu framework.

The reference hardcodes every hyperparameter (reference ``train.py:34-43``,
``audio/constant.py:1-4``).  Here they become defaults of typed config
dataclasses with CLI overrides — the TPU rebuild's config system.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """STFT geometry (reference ``audio/constant.py:1-4``)."""

    n_fft: int = 1024
    n_vec: int = 512          # frames per training sample (image width)
    stft_stride: int = 256    # hop length
    sample_rate: int = 44100

    @property
    def n_bins(self) -> int:
        """Frequency bins kept after dropping the Nyquist row (512)."""
        return self.n_fft // 2

    @property
    def seconds_per_sample(self) -> float:
        """Wall-clock audio seconds covered by one 512x512 sample."""
        return self.n_vec * self.stft_stride / self.sample_rate


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Network geometry (reference ``generator.py:67-76``,
    ``discriminator.py:60-70``)."""

    rand_channels: int = 32
    latent_height: int = 2
    latent_width: int = 2
    # Generator per-block (in, out) channels; 8 blocks: 4x4 .. 512x512.
    gen_channels: Tuple[Tuple[int, int], ...] = (
        (32, 128), (128, 112), (112, 96), (96, 80),
        (80, 64), (64, 48), (48, 32), (32, 16),
    )
    # Discriminator per-block (in, out) channels; 9 blocks: 512 -> 1.
    disc_channels: Tuple[Tuple[int, int], ...] = (
        (16, 32), (32, 48), (48, 64), (64, 80), (80, 96),
        (96, 112), (112, 128), (128, 144), (144, 160),
    )
    leaky_slope: float = 0.2
    pixel_norm_eps: float = 1e-8
    # Generator conv-stack implementation (the synthesis-perf frontier —
    # PERF.md): "xla" (NHWC lax convs), "subpixel" (exact up2x+conv3x3
    # decomposition, 2.25x fewer MACs), "pallas" (fused NCHW kernel,
    # ops/conv.py; inference-only — no VJP), or "auto" (one-time per-shape
    # micro-benchmark at first use picks the winner; training resolves to a
    # differentiable impl).  All impls are numerically parity-tested.
    conv_impl: str = "auto"

    @property
    def n_stages(self) -> int:
        return len(self.gen_channels)  # 8 (stages 0..7)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training hyperparameters (reference ``train.py:34-43,101-116,189``)."""

    batch_size: int = 6
    disc_lr: float = 1e-3
    gen_lr: float = 1e-3
    betas: Tuple[float, float] = (0.0, 0.9)
    nb_epoch: int = 1000
    n_critic: int = 5                # G step every 5th iteration
    grad_penalty_weight: float = 10.0
    # Epsilon-drift penalty (ProGAN paper §A.1: + eps * E[D(x_real)^2]).
    # 0.0 = reference-faithful (the reference has no drift term and its
    # critic scores wander on small corpora — VALIDATION.md); ~1e-3
    # anchors the critic output scale without touching the Wasserstein
    # objective's gradients w.r.t. score DIFFERENCES.
    drift_eps: float = 0.0
    # Generator weight EMA for eval/preview/generate (ProGAN §A.1 and
    # GANSynth both ship it; 0.0 = reference-faithful off).  ~0.999
    # averages the generator over its last ~1k updates, smoothing the
    # late-run critic-drift oscillation so the FINAL checkpoint's audio is
    # the run's best (VALIDATION.md r3).  Training gradients always flow
    # through the raw weights; the EMA copy is carried in TrainState and
    # used only at evaluation.
    ema_decay: float = 0.0
    # Progressive-growth schedule, in cumulative samples viewed.
    fadein_lengths: Tuple[int, ...] = (
        1, 25_000, 37_500, 50_000, 62_500, 75_000, 87_500, 100_000,
    )
    train_lengths: Tuple[int, ...] = (
        50_000, 100_000, 150_000, 200_000, 250_000, 300_000, 350_000,
    )
    save_every: int = 1000           # checkpoint + preview cadence (iters)
    metric_window: int = 20
    log_every: int = 200
    nb_preview: int = 6
    seed: int = 0
    # TPU-specific knobs (no reference equivalent).
    compute_dtype: str = "float32"   # "bfloat16" enables mixed matmul
    # compute.  Default stays float32: validated stage-0..4 comparison
    # (VALIDATION.md r2) shows bf16 tracking f32 through 32x32 but the
    # WGAN gradient penalty destabilizing at 64x64 (GP regularizes an
    # INPUT gradient — the quantity bf16 operand rounding perturbs most).
    # "bfloat16_f32gp" (r3) targets exactly that failure: bf16 operands in
    # every forward EXCEPT the GP branch, which stays f32 (VALIDATION.md
    # r3 for the multi-seed comparison).
    # Inference uses ModelConfig.conv_impl="pallas_bf16" instead.
    data_axis: str = "data"          # mesh axis name for data parallelism
    max_stage: Optional[int] = None  # cap growth (e.g. 3 for 32x32 runs)
    chunk_steps: int = 10            # iterations per dispatch (lax.scan);
    # amortizes host round trips (8x step rate at 4x4 on the bench chip);
    # semantically identical to single stepping (tested); set 1 to disable
    host_pipeline: bool = True       # per-stage scaling on host: the H2D
    # transfer then scales with stage resolution (16,000x less at 4x4)
    # instead of always shipping raw 512x512 batches; numerically identical
    # (tests/test_host_pipeline.py)
    device_dataset: str = "auto"     # "on" | "off" | "auto": ship the whole
    # spectrogram corpus to HBM once and pass per-step INDICES instead of
    # batches — steady-state H2D drops to bytes/iter (and works around
    # PJRT clients that retain every transfer buffer, PERF.md).  "auto"
    # enables it for single-host single-device runs whose corpus fits
    # device_dataset_budget_bytes; implies the in-graph input pipeline.
    device_dataset_budget_bytes: int = 4 << 30
    device_dataset_dtype: str = "float32"  # "bfloat16" stores the RESIDENT
    # corpus in bf16 (half the HBM -> 2x the corpus fits the budget); rows
    # are upcast to f32 as each batch is gathered, so all compute stays
    # f32.  The samples are min-max-normalized images, so bf16's ~3
    # decimal digits perturb inputs by ~4e-3 of full scale — an input
    # quantization, not the GP-gradient rounding that sank bf16 COMPUTE
    # (VALIDATION.md r2).  Single-step metrics match f32-resident to ~1%
    # (tests/test_train.py::test_device_dataset_bf16_resident).
    stall_timeout_s: float = 0.0     # >0 enables the device-stall watchdog
    # (utils/watchdog.py): if no metric fetch / checkpoint completes for
    # this long, the process exits 75 (EX_TEMPFAIL) so a supervisor
    # (`train --max-restarts`, utils/supervise.py) can restart from the
    # latest checkpoint.  Must exceed log_every x step-time PLUS one cold
    # stage compile; the CLI uses 900 s.  0 keeps library calls exempt.
    tb_dir: Optional[str] = None     # optional TensorBoard sink (lead host
    # only, fed on the log cadence — zero per-step syncs); closes the
    # reference's queryable-store feature (reference train.py:238-244)
    mlflow_uri: Optional[str] = None  # optional MLflow tracking sink (same
    # cadence/host discipline; requires the mlflow package — reference
    # train.py:24-30)


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    """Inference defaults (reference ``generate.py:12-65``,
    ``__main__.py:67-78``)."""

    nb_vec: int = 10     # latent width multiplier -> ~29.7 s of audio
    nb_music: int = 5


def config_to_json(cfg) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2, default=str)


def train_config_from_overrides(**overrides) -> TrainConfig:
    """Build a TrainConfig from CLI-style overrides, ignoring ``None``s."""
    clean = {k: v for k, v in overrides.items() if v is not None}
    return dataclasses.replace(TrainConfig(), **clean)
