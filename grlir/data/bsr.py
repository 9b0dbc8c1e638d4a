"""Real-world / blind SR dataset (restoration_bsr.py:40-138).

Train: 400px reflect-pad/random-crop -> dihedral augment -> ColorJitter -> USM
sharpening -> second-order BSRGAN degradation with random camera ISP (all in
grlir.data.bsr_utils, threaded host CPU) -> aligned LR/HR patch crop.  Emits
img_gt_usm for the per-loss USM-target selection in the GAN engine.
Val: GT-free mode (img_lq = img_gt for NIQE) or synthetic-with-GT mode.
"""

from __future__ import annotations

import numpy as np

from grlir.data import bsr_utils as B
from grlir.data.base import TRAIN, ImageBaseDataset, get_test_file, get_train_file, to_float
from grlir.data.tasks import TaskConfig


def get_train_file_bsr(dataset: str):
    """BSR corpus resolver; 'all' = LSDIR-x4-extended + OST +
    SCUT-CTW1500[200:] + FFHQ (restoration_bsr.py:25-37)."""
    dataset = dataset.lower()
    if dataset == "all":
        return (
            get_train_file("lsdir_x4_extended")
            + get_train_file("ost")
            + get_train_file("scut_ctw1500")[200:]
            + get_train_file("ffhq")
        )
    return get_train_file(dataset)


class BSRDataset(ImageBaseDataset):
    def __init__(self, cfg: TaskConfig, stage: str, num_train_samples: int = 0):
        self.sf = cfg.scale or 4
        if stage == TRAIN:
            self.patch_size = cfg.patch_size  # LR patch
            self.use_usm = True
            self.img_info = get_train_file_bsr(cfg.dataset)
        else:
            self.img_info = get_test_file(cfg.dataset)
        self.with_gt = cfg.with_gt  # val: synthesize pairs? (reference: cfg.with_gt)
        super().__init__(cfg, stage, num_train_samples)
        self.ispmodel = B.ISPModel(rng=np.random.default_rng(12345))

    def seed(self, seed: int):
        """Per-worker reseed: decorrelate the ISP simulator too, not just the
        crop/augment rng (process workers start from identical pickled state)."""
        super().seed(seed)
        self.ispmodel.rng = np.random.default_rng(seed + 1)
        self.ispmodel.count = 0
        self.ispmodel.isp = None

    def __getitem__(self, index: int):
        import cv2

        index = self._get_index(index)
        img_gt = self._load_item(index)
        img_gt = self._augment(img_gt)

        if self.stage == TRAIN:
            H, W = img_gt.shape[:2]
            crop = 400
            if H < crop or W < crop:
                img_gt = cv2.copyMakeBorder(
                    img_gt, 0, max(0, crop - H), 0, max(0, crop - W),
                    cv2.BORDER_REFLECT_101,
                )
            H, W = img_gt.shape[:2]
            x = int(self.rng.integers(0, max(0, H - crop) + 1))
            y = int(self.rng.integers(0, max(0, W - crop) + 1))
            img_gt = img_gt[x: x + crop, y: y + crop]

            img_gt = B.color_jitter(to_float(img_gt), self.rng)
            img_gt_usm = B.usm_sharp(img_gt) if self.use_usm else img_gt
            img_lq, img_gt_usm = B.degradation_sr2(
                img_gt_usm, self.sf, self.ispmodel, self.rng)
            (img_gt, img_gt_usm), img_lq = self._sample_patch(
                [img_gt, img_gt_usm], img_lq, self.sf)
            return {
                "indices": index,
                "img_lq": np.ascontiguousarray(img_lq),
                "img_gt": np.ascontiguousarray(img_gt),
                "img_gt_usm": np.ascontiguousarray(img_gt_usm),
                "filenames": self.img_info[index][0],
            }

        img_gt = to_float(img_gt)
        if self.with_gt:
            img_lq, img_gt = B.degradation_sr2(img_gt, self.sf, self.ispmodel,
                                               np.random.default_rng(index))
            return {
                "indices": index,
                "img_lq": np.ascontiguousarray(img_lq),
                "img_gt": np.ascontiguousarray(img_gt),
                "filenames": self.img_info[index][0],
            }
        # GT-free validation (NIQE): lq is the real-world image itself
        return {
            "indices": index,
            "img_lq": img_gt,
            "img_gt": np.zeros((1,), np.float32),
            "filenames": self.img_info[index][0],
        }
