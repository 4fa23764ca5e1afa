"""Shared tiny model config for loop-mechanics tests (full-size parity
coverage lives in test_models.py; one full-size step smoke in
test_train.py).  Channel chains mirror the reference architecture's
structure (8 G blocks, 9 D blocks, consecutive in/out agreement) at ~1/10
the width, cutting compile-dominated test wall-time ~4x."""

from musicgan_tpu.config import ModelConfig

TINY_MODEL = ModelConfig(
    rand_channels=8,
    gen_channels=(
        (8, 16), (16, 12), (12, 10), (10, 8),
        (8, 8), (8, 6), (6, 4), (4, 4),
    ),
    disc_channels=(
        (4, 6), (6, 8), (8, 10), (10, 12), (12, 14),
        (14, 16), (16, 18), (18, 20), (20, 24),
    ),
)
