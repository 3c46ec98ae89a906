"""TrainLoader sampler/resume semantics (no image decoding: _make_batch
is stubbed to return the raw index list, so these tests exercise exactly
the index math that defines the training data stream).

Covers:
  * resume fast-forward — a loader restarted at start_iter=k yields the
    identical batch sequence an uninterrupted run produces from batch k
    (reference: IterationBasedBatchSampler restarted at
    scheduler.iteration, tools/rcnn/train_net.py:127);
  * tail retention — GroupedBatchSampler(drop_uneven=False)
    (pet/utils/data/samplers/grouped_batch_sampler.py:93) keeps every
    image; our fixed-shape analogue carries group tails into the next
    epoch, so nothing is ever dropped and all batches stay full-size;
  * DATALOADER.SAMPLER_TRAIN wiring — RepeatFactorTrainingSampler
    (pet/utils/data/samplers/repeat_factor.py:100-155) changes epoch
    composition per the stochastic-ceil rule.
"""

import numpy as np
import pytest

from cpm_tpu.config import get_default_cfg
from cpm_tpu.data.loader import TrainLoader


class _FakeDataset:
    """Aspect ratios + labels only — enough for the index machinery."""

    def __init__(self, n, labels_by_index=None, aspect=None):
        self.n = n
        self._labels = labels_by_index or {}
        self._aspect = (
            np.asarray(aspect, np.float64)
            if aspect is not None
            else np.ones(n, np.float64) * 1.5
        )

    def __len__(self):
        return self.n

    def aspect_ratios(self):
        return self._aspect

    def load_annotations(self, i):
        labels = np.asarray(self._labels.get(i, [1]), np.int64)
        boxes = np.zeros((len(labels), 4), np.float32)
        return boxes, labels


def _index_stream(loader, n_batches):
    """First n_batches of the loader's batch-index stream."""
    loader._make_batch = lambda batch_indices, rng: list(batch_indices)
    it = loader._raw_iter()
    return [next(it) for _ in range(n_batches)]


def _make_loader(cfg, dataset, **kw):
    kw.setdefault("prefetch", 0)
    return TrainLoader(cfg, dataset, kw.pop("batch_size", 4), **kw)


@pytest.fixture()
def cfg():
    c = get_default_cfg()
    return c


def test_resume_fast_forward_matches_straight_run(cfg):
    ds = _FakeDataset(23)
    full = _index_stream(_make_loader(cfg, ds, seed=3), 40)
    for k in (1, 5, 17, 29):
        resumed = _index_stream(
            _make_loader(cfg, ds, seed=3, start_iter=k), 40 - k
        )
        assert resumed == full[k:], f"divergence resuming at iter {k}"


def test_resume_fast_forward_across_epochs(cfg):
    # 10 images / batch 4 -> 2 full batches per epoch + carried tail;
    # start_iter far beyond one epoch exercises the whole-epoch skip
    ds = _FakeDataset(10)
    full = _index_stream(_make_loader(cfg, ds, seed=0, batch_size=4), 30)
    resumed = _index_stream(
        _make_loader(cfg, ds, seed=0, batch_size=4, start_iter=25), 5
    )
    assert resumed == full[25:]


def test_tail_batches_carried_not_dropped(cfg):
    # 11 landscape + 6 portrait images, batch 4: per epoch the landscape
    # group leaves a 3-image tail and portrait a 2-image tail. With
    # drop_uneven=False semantics no index may ever be lost.
    aspect = [1.5] * 11 + [0.6] * 6
    ds = _FakeDataset(17, aspect=aspect)
    loader = _make_loader(cfg, ds, seed=1)
    n_epochs = 8
    # count how many batches the stream yields while consuming exactly
    # n_epochs worth of epoch indices: total indices in = 17 * n_epochs,
    # so total indices out must equal it up to the final carry (< 2
    # groups * batch_size leftovers still in flight)
    stream = _index_stream(loader, (17 * n_epochs) // 4)
    counts = {}
    for b in stream:
        assert len(b) == 4  # fixed-shape: every batch full-size
        for i in b:
            counts[i] = counts.get(i, 0) + 1
    seen_total = sum(counts.values())
    assert seen_total == 4 * len(stream)
    # every index appears, and appearance counts are balanced within +-2
    # (carry can defer a tail image by at most one epoch boundary)
    assert set(counts) == set(range(17))
    assert max(counts.values()) - min(counts.values()) <= 2


def test_tail_carry_preserves_orientation_groups(cfg):
    aspect = [1.5] * 5 + [0.6] * 5
    ds = _FakeDataset(10, aspect=aspect)
    loader = _make_loader(cfg, ds, seed=2)
    stream = _index_stream(loader, 10)
    for b in stream:
        kinds = {int(aspect[i] >= 1) for i in b}
        assert len(kinds) == 1, "batch mixes orientations"


def test_sampler_train_default_is_distributed(cfg):
    ds = _FakeDataset(12)
    loader = _make_loader(cfg, ds)
    idx = loader._epoch_indices(0)
    # plain DistributedSampler epoch: a permutation, each index once
    assert sorted(idx.tolist()) == list(range(12))


def test_repeat_factor_sampler_wired_via_config(cfg):
    # category 7 appears in only 1 of 40 images (f = 0.025); with
    # REPEAT_THRESHOLD = 0.4 its repeat factor is sqrt(0.4/0.025) = 4,
    # common category 1 has sqrt(0.4/1.0) < 1 -> clamped to 1. The rare
    # image must appear ~4x per epoch, commons exactly once.
    labels = {i: [1] for i in range(40)}
    labels[13] = [1, 7]
    ds = _FakeDataset(40, labels_by_index=labels)
    cfg.DATALOADER.SAMPLER_TRAIN = "RepeatFactorTrainingSampler"
    cfg.DATALOADER.RFTSAMPLER.REPEAT_THRESHOLD = 0.4
    loader = _make_loader(cfg, ds)
    assert loader._repeat_factors is not None
    np.testing.assert_allclose(loader._repeat_factors[13], 4.0, rtol=1e-6)
    np.testing.assert_allclose(loader._repeat_factors[0], 1.0)
    counts = np.zeros(40, np.int64)
    for epoch in range(6):
        idx = loader._epoch_indices(epoch)
        assert len(idx) == 43  # 39 commons + 4 copies of the rare image
        for i in idx:
            counts[i] += 1
    assert counts[13] == 24  # exactly 4 per epoch (integer factor)
    others = np.delete(counts, 13)
    assert (others == 6).all()


def test_repeat_factor_pow_and_clamps(cfg):
    # POW=1.0 linear rule with MAX clamp: rare category f=0.025,
    # t=0.4 -> t/f = 16, clamped to MAX_REPEAT_TIMES=3
    labels = {i: [1] for i in range(40)}
    labels[5] = [7]
    ds = _FakeDataset(40, labels_by_index=labels)
    cfg.DATALOADER.SAMPLER_TRAIN = "RepeatFactorTrainingSampler"
    cfg.DATALOADER.RFTSAMPLER.REPEAT_THRESHOLD = 0.4
    cfg.DATALOADER.RFTSAMPLER.POW = 1.0
    cfg.DATALOADER.RFTSAMPLER.MAX_REPEAT_TIMES = 3.0
    loader = _make_loader(cfg, ds)
    np.testing.assert_allclose(loader._repeat_factors[5], 3.0)


def test_world_sharding_disjoint_under_repeat_factor(cfg):
    labels = {i: [1] for i in range(20)}
    ds = _FakeDataset(20, labels_by_index=labels)
    cfg.DATALOADER.SAMPLER_TRAIN = "RepeatFactorTrainingSampler"
    l0 = _make_loader(cfg, ds, rank=0, world_size=2)
    l1 = _make_loader(cfg, ds, rank=1, world_size=2)
    i0, i1 = l0._epoch_indices(0), l1._epoch_indices(0)
    assert len(i0) == len(i1) == 10  # contiguous equal slices
    assert np.concatenate([i0, i1]).shape[0] == 20
