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


def test_process_loader_matches_thread(tmp_path):
    """worker_type='process' must yield bit-identical batches in the
    same order as the thread pool (same seed, same shuffle)."""
    import pytest
    pytest.importorskip('cv2')
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train_api import make_train_dataset
    from das_tpu.datasets import build_dataset

    ann = make_train_dataset(str(tmp_path), n_images=6)
    ds_cfg = dict(type='CMUPanopticDataset', ann_file=ann,
                  img_prefix=str(tmp_path), norm_depth=True, abs_dz=True,
                  depth_factor=1,
                  pipeline=[
                      dict(type='LoadImageFromFile', to_float32=True),
                      dict(type='LoadAnnotationsPose3D', with_bbox=True,
                           with_label=True),
                      dict(type='Collect3D',
                           keys=['img', 'gt_bboxes', 'gt_labels',
                                 'gt_poses_3d', 'gt_labels_3d',
                                 'centers2d', 'depths'],
                           num_joints=15),
                  ])
    dataset = build_dataset(ds_cfg)
    kw = dict(batch_size=2, pad_hw=(96, 128), num_joints=15, max_gt=4,
              seed=7)
    lt = TrainLoader(dataset, num_workers=2, **kw)
    lp = TrainLoader(dataset, num_workers=2, worker_type='process',
                     dataset_cfg=ds_cfg, **kw)
    it_t, it_p = iter(lt), iter(lp)
    for _ in range(4):
        bt, bp = next(it_t), next(it_p)
        for k in bt:
            np.testing.assert_array_equal(bt[k], bp[k])
