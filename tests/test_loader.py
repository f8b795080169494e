"""TrainLoader batching/padding tests (no device work)."""

import numpy as np

from das_tpu.datasets.loader import TrainLoader, pad_batch, \
    train_pad_hw_from_cfg

J = 4


class FakeDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.RandomState(idx)
        h, w = 40 + idx % 3 * 8, 60
        g = 1 + idx % 3
        return dict(
            img=rng.rand(h, w, 3).astype(np.float32),
            gt_poses_3d=rng.rand(g, 3 + 4 * J).astype(np.float32),
            centers2d=rng.rand(g, 2).astype(np.float32),
            depths=rng.rand(g).astype(np.float32),
            img_metas={})


def test_pad_batch_shapes():
    ds = FakeDataset()
    samples = [ds[i] for i in range(3)]
    batch = pad_batch(samples, (64, 64), max_gt=5, num_joints=J)
    assert batch['img'].shape == (3, 64, 64, 3)
    assert batch['gt_poses_3d'].shape == (3, 5, 3 + 4 * J)
    assert batch['gt_valid'].shape == (3, 5)
    assert batch['gt_valid'][0].sum() == 1
    assert batch['gt_valid'][2].sum() == 3
    # padding region is zero
    assert batch['img'][0, 50:].sum() == 0


def test_loader_iterates_fixed_shapes():
    loader = TrainLoader(FakeDataset(), batch_size=4, pad_hw=(64, 64),
                         num_joints=J, max_gt=6, num_workers=2)
    it = iter(loader)
    for _ in range(3):
        batch = next(it)
        assert batch['img'].shape == (4, 64, 64, 3)
        assert batch['gt_poses_3d'].shape == (4, 6, 3 + 4 * J)


def test_loader_sharding_disjoint():
    l0 = TrainLoader(FakeDataset(8), 2, (64, 64), J, seed=3,
                     shard_id=0, num_shards=2)
    l1 = TrainLoader(FakeDataset(8), 2, (64, 64), J, seed=3,
                     shard_id=1, num_shards=2)
    o0 = set(l0._epoch_order().tolist())
    o1 = set(l1._epoch_order().tolist())
    assert o0 | o1 == set(range(8))
    assert not (o0 & o1)


def test_train_pad_hw_from_cfg():
    pipe = [dict(type='LoadImageFromFile'),
            dict(type='ResizePose',
                 img_scale=[(1333, 512), (1333, 640)],
                 multiscale_mode='range', keep_ratio=True)]
    assert train_pad_hw_from_cfg(pipe) == (640, 1344)
