"""UMoED trainer (reference /root/reference/runners/UMoED/runner.py:124-268):
best-mAP tracking for all FOUR directions, a fusion code buffer in the .mat
schema (unused at eval — reference writes an empty buffer), and no model
snapshots on best (the reference comments them out)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..registry import registry
from .base import BaseTrainer


@registry.register_runner("UMoEDTrainer")
class UMoEDTrainer(BaseTrainer):
    def __init__(self, cfg, **kwargs):
        self.hash_func = cfg.model.get("hash_func", "linear_subspace")
        self.hash_scale = 2 if self.hash_func == "softmax" else 1
        cfg.model.update({"txt_token_size": cfg.dataset.get("max_word", 32)})
        self.max_mapi2i = 0.0
        self.max_mapt2t = 0.0
        self.best_epoch_i2i = 0
        self.best_epoch_t2t = 0
        super().__init__(cfg, **kwargs)

    def _extra_checkpoint_meta(self):
        return {"max_mapi2i": float(self.max_mapi2i),
                "max_mapt2t": float(self.max_mapt2t),
                "best_epoch_i2i": int(self.best_epoch_i2i),
                "best_epoch_t2t": int(self.best_epoch_t2t)}

    def _restore_extra_checkpoint_meta(self, extra):
        if extra:
            self.max_mapi2i = float(extra["max_mapi2i"])
            self.max_mapt2t = float(extra["max_mapt2t"])
            self.best_epoch_i2i = int(extra["best_epoch_i2i"])
            self.best_epoch_t2t = int(extra["best_epoch_t2t"])

    def valid(self, epoch: int, k: Optional[int] = None):
        save_dir = os.path.join(self.save_dir, "mat_files")
        os.makedirs(save_dir, exist_ok=True)
        self.logger.info("Valid.")
        query_img, query_txt = self.get_code(self.query_loader, self.query_num)
        retrieval_img, retrieval_txt = self.get_code(
            self.retrieval_loader, self.retrieval_num
        )
        q_fus = np.zeros_like(np.asarray(query_img))
        r_fus = np.zeros_like(np.asarray(retrieval_img))

        mapi2t, mapt2i, mapi2i, mapt2t = self.calc_map_4dir(
            query_img, query_txt, retrieval_img, retrieval_txt, k
        )

        def save(name):
            self.save_mat_fusion(
                query_img, query_txt, q_fus, self.query_labels, retrieval_img,
                retrieval_txt, r_fus, self.retrieval_labels,
                save_file=os.path.join(save_dir, name),
            )

        if self.max_mapi2t < mapi2t:
            self.best_epoch_i = epoch
            save("i2t-best.mat")
        self.max_mapi2t = max(self.max_mapi2t, mapi2t)
        if self.max_mapt2i < mapt2i:
            self.best_epoch_t = epoch
            save("t2i-best.mat")
        self.max_mapt2i = max(self.max_mapt2i, mapt2i)
        if self.max_mapi2i < mapi2i:
            self.best_epoch_i2i = epoch
            save("i2i-best.mat")
        self.max_mapi2i = max(self.max_mapi2i, mapi2i)
        if self.max_mapt2t < mapt2t:
            self.best_epoch_t2t = epoch
            save("t2t-best.mat")
        self.max_mapt2t = max(self.max_mapt2t, mapt2t)
        save("last.mat")
        self.logger.info(
            f">>>>>> [{epoch}/{self.epochs}], MAP(i->t): {mapi2t}, "
            f"MAP(t->i): {mapt2i}, MAP(t->t): {mapt2t}, MAP(i->i): {mapi2i}, "
            f"MAX MAP(i->t): {self.max_mapi2t}, MAX MAP(t->i): {self.max_mapt2i}, "
            f"MAX MAP(i->i): {self.max_mapi2i}, MAX MAP(t->t): {self.max_mapt2t}"
        )
        return mapi2t, mapt2i, mapi2i, mapt2t

    @classmethod
    def save_mat_fusion(cls, query_img, query_txt, query_fusion, query_labels,
                        retrieval_img, retrieval_txt, retrieval_fusion,
                        retrieval_labels, save_file="i2t"):
        import scipy.io as scio

        scio.savemat(save_file, {
            "q_img": np.asarray(query_img),
            "q_txt": np.asarray(query_txt),
            "q_fus": np.asarray(query_fusion),
            "r_img": np.asarray(retrieval_img),
            "r_txt": np.asarray(retrieval_txt),
            "r_fus": np.asarray(retrieval_fusion),
            "q_l": np.asarray(query_labels),
            "r_l": np.asarray(retrieval_labels),
        })
