"""Base COCO-style pose dataset machinery.

Replaces the mmdet CocoDataset plumbing the reference datasets inherit
(filtering, cat mapping, train/test sample preparation) with a compact
framework-native base class. Subclasses implement ``_parse_ann_info``.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .coco_index import CocoIndex
from .pipelines import Compose


class BasePoseDataset:
    CLASSES: Sequence[str] = ('person',)

    def __init__(self,
                 ann_file: str,
                 pipeline: Optional[list] = None,
                 data_root: Optional[str] = None,
                 img_prefix: str = '',
                 classes: Optional[Sequence[str]] = None,
                 test_mode: bool = False,
                 filter_empty_gt: bool = True,
                 load_interval: int = 1,
                 **kwargs):
        if classes is not None:
            self.CLASSES = tuple(classes)
        self.data_root = data_root
        if data_root is not None and not os.path.isabs(ann_file):
            ann_file = os.path.join(data_root, ann_file)
        self.ann_file = ann_file
        self.img_prefix = img_prefix
        self.test_mode = test_mode
        self.load_interval = load_interval

        self.coco = CocoIndex(ann_file)
        self.cat_ids = self.coco.get_cat_ids(cat_names=self.CLASSES) or \
            self.coco.get_cat_ids()
        self.cat2label = {cid: i for i, cid in enumerate(self.cat_ids)}
        self.img_ids = self.coco.get_img_ids()
        self.data_infos = self.coco.load_imgs(self.img_ids)
        if not test_mode and filter_empty_gt:
            keep = [i for i, img_id in enumerate(self.img_ids)
                    if len(self.coco.get_ann_ids([img_id])) > 0]
            self.img_ids = [self.img_ids[i] for i in keep]
            self.data_infos = [self.data_infos[i] for i in keep]
        if load_interval > 1:
            self.img_ids = self.img_ids[::load_interval]
            self.data_infos = self.data_infos[::load_interval]

        self.name2id = {}
        for info in self.data_infos:
            self.name2id[os.path.basename(info['file_name'])] = info['id']

        self.pipeline = Compose(pipeline) if pipeline else None

    # ------------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.data_infos)

    def get_ann_info(self, idx: int):
        img_id = self.img_ids[idx]
        ann_ids = self.coco.get_ann_ids(img_ids=[img_id])
        ann_info = self.coco.load_anns(ann_ids)
        return self._parse_ann_info(self.data_infos[idx], ann_info)

    def _parse_ann_info(self, img_info, ann_info):
        raise NotImplementedError

    def pre_pipeline(self, results: Dict):
        results['img_prefix'] = self.img_prefix
        results['bbox_fields'] = []
        results['img_fields'] = []
        results['pose3d_fields'] = []

    def prepare_train_img(self, idx: int):
        ann_info = self.get_ann_info(idx)
        if ann_info is None or len(ann_info['gt_poses_3d']) == 0:
            return None
        results = dict(img_info=self.data_infos[idx], ann_info=ann_info)
        self.pre_pipeline(results)
        return self.pipeline(results)

    def prepare_test_img(self, idx: int):
        ann_info = self.get_ann_info(idx)
        n_ann = dict(
            gt_poses_3d=ann_info['gt_poses_3d'],
            gt_labels_3d=ann_info['gt_labels_3d'],
            centers2d=ann_info['centers2d'],
            depths=ann_info['depths'])
        if 'cam' in ann_info:
            n_ann['cam'] = ann_info['cam']
        results = dict(img_info=self.data_infos[idx], ann_info=n_ann)
        self.pre_pipeline(results)
        return self.pipeline(results)

    def __getitem__(self, idx: int):
        if self.test_mode:
            return self.prepare_test_img(idx)
        # resample on invalid, like mmdet's _rand_another
        for _ in range(64):
            data = self.prepare_train_img(idx)
            if data is not None:
                return data
            idx = np.random.randint(len(self))
        raise RuntimeError('failed to draw a valid training sample')


class ConcatDataset:
    """list-of-dataset-configs mixing (ref datasets/builder.py:20-43)."""

    def __init__(self, datasets: List[Any]):
        self.datasets = datasets
        self.cum = np.cumsum([len(d) for d in datasets])

    def __len__(self):
        return int(self.cum[-1])

    def __getitem__(self, idx):
        d = int(np.searchsorted(self.cum, idx, side='right'))
        base = 0 if d == 0 else int(self.cum[d - 1])
        return self.datasets[d][idx - base]


class RepeatDataset:
    def __init__(self, dataset, times: int):
        self.dataset = dataset
        self.times = times

    def __len__(self):
        return len(self.dataset) * self.times

    def __getitem__(self, idx):
        return self.dataset[idx % len(self.dataset)]
