"""Multi-worker prefetching batch iterator (train/train_net.py), replacing
the reference's D2 dataloader workers (reference train_net.py:254-260,
DATALOADER.NUM_WORKERS)."""
import collections

import numpy as np

from rba_tpu.train.train_net import prefetching_iterator


class _StubDS:
    class _S:
        def __init__(self, i):
            self.image = np.full((4, 6, 3), i, np.uint8)
            self.label = np.full((4, 6), i, np.uint8)

    def __len__(self):
        return 23

    def __getitem__(self, i):
        return self._S(i)


def _mapper(image, label):
    return {"images": image.astype(np.float32), "sem_seg": label.astype(np.int32)}


def test_prefetching_iterator_epoch_coverage_and_shapes():
    ds = _StubDS()
    bs = 4
    it = prefetching_iterator(ds, _mapper, batch_size=bs, seed=0, workers=3)
    per_epoch = len(ds) // bs  # 5 batches; the 3-sample tail is dropped

    seen = collections.Counter()
    for _ in range(3 * per_epoch):
        b = next(it)
        assert b["images"].shape == (bs, 4, 6, 3)
        assert b["sem_seg"].shape == (bs, 4, 6)
        for v in b["images"][:, 0, 0, 0]:
            seen[int(v)] += 1

    # batches may arrive out of order across workers (and the queue
    # prefetches into the next epoch), but each id appears at most once per
    # permutation, so in 15 consumed batches an id can occur at most 4
    # times (epochs 1-3 plus one prefetched epoch-4 batch) and the totals
    # match exactly 3 epochs of (len(ds) // bs) * bs samples
    assert sum(seen.values()) == 3 * per_epoch * bs
    assert max(seen.values()) <= 4
    assert set(seen) <= set(range(len(ds)))
    # the permutations cover most ids across epochs (seeded shuffle,
    # 20/23 drawn per epoch)
    assert len(seen) >= 18


def test_prefetching_iterator_single_worker():
    it = prefetching_iterator(_StubDS(), _mapper, batch_size=2, seed=1, workers=1)
    b = next(it)
    assert b["images"].shape == (2, 4, 6, 3)
