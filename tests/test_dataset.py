"""Batch-iterator order semantics (resume fast-forward skip)."""

import numpy as np

from musicgan_tpu.audio.dataset import (
    SpectrogramDataset,
    batch_indices,
    batch_iterator,
)
from musicgan_tpu.audio.ingest import ShardWriter


def _write_ds(tmp_path, n=20):
    w = ShardWriter(str(tmp_path / "ds"), samples_per_shard=8)
    rng = np.random.default_rng(0)
    w.add(rng.uniform(-1, 1, (n, 2, 8, 8)).astype(np.float32))
    w.close()
    return str(tmp_path / "ds")


def test_batch_skip_matches_full_order(tmp_path):
    """skip=N yields exactly the full epoch order minus its first N
    batches — for both the index-level and data-loading iterators (the
    latter must skip at the *index* level: no sample IO for skipped
    batches)."""
    full = list(batch_indices(37, 5, seed=3))
    skipped = list(batch_indices(37, 5, seed=3, skip=4))
    assert len(skipped) == len(full) - 4
    for a, b in zip(full[4:], skipped):
        np.testing.assert_array_equal(a, b)

    ds = SpectrogramDataset(_write_ds(tmp_path))
    full_b = list(batch_iterator(ds, 4, seed=1))
    skip_b = list(batch_iterator(ds, 4, seed=1, skip=2))
    assert len(skip_b) == len(full_b) - 2
    for a, b in zip(full_b[2:], skip_b):
        np.testing.assert_array_equal(a, b)


def test_batch_skip_never_touches_skipped_data(tmp_path, monkeypatch):
    """The fast-forward drops permutation indices before data loading: a
    50k-batch skip must not cost hours of discarded memmap reads."""
    ds = SpectrogramDataset(_write_ds(tmp_path))
    gathered = []
    orig = SpectrogramDataset.gather

    def spy(self, idx):
        gathered.append(np.asarray(idx))
        return orig(self, idx)

    monkeypatch.setattr(SpectrogramDataset, "gather", spy)
    out = list(batch_iterator(ds, 4, seed=1, skip=3))
    assert len(gathered) == len(out)  # one gather per YIELDED batch only


def test_as_array_host_side_dtype_cast(tmp_path):
    """as_array(dtype) casts shard-by-shard on the HOST so the
    device-resident ship uploads exactly the resident bytes — a float32
    upload of a corpus larger than HBM OOMs at init (r4 10x corpus:
    17.4 GB f32 vs 16 GB HBM; train/loop.py ships via device_put)."""
    import jax.numpy as jnp

    ds = SpectrogramDataset(_write_ds(tmp_path, n=20))
    f32 = ds.as_array()
    assert f32.dtype == np.float32 and f32.shape == (20, 2, 8, 8)
    bf16 = ds.as_array(jnp.bfloat16)
    assert bf16.dtype == jnp.bfloat16  # numpy buffer, ml_dtypes dtype
    assert isinstance(bf16, np.ndarray)
    np.testing.assert_array_equal(
        np.asarray(bf16), f32.astype(jnp.bfloat16)
    )


def test_refresh_limit_caps_and_releases(tmp_path):
    """refresh(limit=) semantics (multi-host streaming agreement,
    train/loop.py): the view never exceeds the agreed cap, a capped view
    stays incomplete (withheld rows + the final complete flip must remain
    reachable), and later refreshes release the held-back rows."""
    data = np.random.default_rng(1).uniform(-1, 1, (24, 2, 8, 8))
    data = data.astype(np.float32)
    w = ShardWriter(str(tmp_path / "ds"), samples_per_shard=8)
    w.add(data[:16])  # two flushed shards, index total=16, complete=False
    ds = SpectrogramDataset(str(tmp_path / "ds"))
    assert len(ds) == 16 and not ds.complete

    w.add(data[16:24])  # third shard appears on disk
    assert ds.peek_total() == 24  # peek sees disk without mutating
    assert len(ds) == 16

    assert ds.refresh(limit=20) is True
    assert len(ds) == 20
    assert not ds.complete  # capped: rows 20-23 withheld, stays incomplete
    np.testing.assert_allclose(ds[19], data[19], rtol=0, atol=0)

    # same cap again: no growth, still incomplete
    assert ds.refresh(limit=20) is False
    assert not ds.complete

    w.close()  # disk flips complete=True at total 24
    assert ds.refresh(limit=24) is True
    assert len(ds) == 24 and ds.complete  # cap == disk: adopt completeness
    np.testing.assert_allclose(ds[23], data[23], rtol=0, atol=0)

    # uncapped refresh on a complete view is a no-op
    assert ds.refresh() is False

def test_refresh_limit_shrinks_oversized_view(tmp_path):
    """A view larger than the agreed limit SHRINKS to it (multi-host
    convergence, train/loop.py): hosts that opened their dataset copies
    at different mid-ingest snapshot sizes would otherwise compose
    different batch counts and deadlock the pod's collectives.  Shrink
    is in-memory (works even when the on-disk index is unreadable) and
    the hidden rows come back through a later, larger agreement."""
    data = np.random.default_rng(2).uniform(-1, 1, (24, 2, 8, 8))
    data = data.astype(np.float32)
    w = ShardWriter(str(tmp_path / "ds"), samples_per_shard=8)
    w.add(data[:24])  # three flushed shards on disk
    ds = SpectrogramDataset(str(tmp_path / "ds"))
    assert len(ds) == 24  # opened "ahead" of a lagging peer host

    # Peer offers only 16 -> agreed=16 -> this host must shrink.
    assert ds.refresh(limit=16) is False  # shrink is not growth
    assert len(ds) == 16
    assert not ds.complete  # rows 16-23 withheld, must stay reachable
    np.testing.assert_allclose(ds[15], data[15], rtol=0, atol=0)

    # A later, larger agreement releases the hidden rows again.
    assert ds.refresh(limit=24) is True
    assert len(ds) == 24
    np.testing.assert_allclose(ds[23], data[23], rtol=0, atol=0)

    # Shrink must hold even for COMPLETE views (a finished local ingest
    # next to a still-syncing peer) -- the early complete-return in
    # refresh() must not bypass it.
    w.close()
    assert ds.refresh(limit=24) is False
    assert ds.complete
    assert ds.refresh(limit=8) is False
    assert len(ds) == 8
    assert ds.refresh(limit=24) is True  # and it can come back
    assert len(ds) == 24 and ds.complete
