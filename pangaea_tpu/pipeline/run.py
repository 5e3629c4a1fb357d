"""The 4-step resumable pipeline (reference: src/pangaea.py:23-125).

Step layout and resume markers mirror the reference exactly:

  1.features/feature_finished      feature extraction
  2.vae/model_finished             VAE training + latent dump
  3.clustering/clustering_finished RPH-KMeans + per-bin read extraction
  4.assembly/assemble_finished     multi-threshold reassembly + ensemble

Each step is skipped when its marker exists (check_steps_finish,
src/pangaea.py:23-35) and can be re-run from its artifacts.
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict
from typing import Optional

import numpy as np

from pangaea_tpu.config import PangaeaConfig
from pangaea_tpu.features import FeatureExtractor
from pangaea_tpu.io.extract_reads import extract_reads

log = logging.getLogger(__name__)

_MARKERS = {
    "1": ("1.features", "feature_finished"),
    "2": ("2.vae", "model_finished"),
    "3": ("3.clustering", "clustering_finished"),
    "4": ("4.assembly", "assemble_finished"),
}


def check_step_finished(output: str, step: str) -> bool:
    sub, marker = _MARKERS[step]
    d = os.path.join(output, sub)
    return os.path.isdir(d) and os.path.exists(os.path.join(d, marker))


# TPU backends can die mid-run with transient runtime errors (observed on
# long jobs: FAILED_PRECONDITION / "TPU backend error"; the device then
# recovers by itself, but observed wedges take up to ~10-20 minutes to
# clear). Every step is idempotent — it either writes its marker or
# leaves a partial directory its own resume logic handles — so delayed
# in-process retries turn a transient device death into a hiccup instead
# of a failed pipeline. The backoff schedule (2 + 6 + 12 min ≈ 20 min
# total) is sized to outlast the longest observed wedge. Genuine bugs
# (Python exceptions, shape errors) are NOT retried.
_TRANSIENT_MARKERS = ("FAILED_PRECONDITION", "TPU backend error",
                      "DEADLINE_EXCEEDED", "UNAVAILABLE")
_TRANSIENT_RETRY_DELAYS_S = (120.0, 360.0, 720.0)


def _retry_transient(fn, what: str):
    import time
    for delay in _TRANSIENT_RETRY_DELAYS_S:
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered below
            msg = f"{type(e).__name__}: {e}"
            if not any(m in msg for m in _TRANSIENT_MARKERS):
                raise
            log.warning("%s hit a transient device error (%s); retrying in "
                        "%.0f s", what, msg.splitlines()[0][:200], delay)
            time.sleep(delay)
    return fn()


class Pipeline:
    def __init__(self, cfg: PangaeaConfig):
        self.cfg = cfg
        self.feature_dir = os.path.join(cfg.output, "1.features")
        self.model_dir = os.path.join(cfg.output, "2.vae")
        self.cluster_dir = os.path.join(cfg.output, "3.clustering")
        self.assembly_dir = os.path.join(cfg.output, "4.assembly")

    # ---- step 1 -----------------------------------------------------------

    def step1_features(self):
        fe = FeatureExtractor(self.cfg.feature, self.feature_dir)
        out = fe.extract_features(self.cfg.reads1, self.cfg.reads2,
                                  self.cfg.interleaved_reads,
                                  defer_save=True)
        self._fe_pending = fe
        return out

    def finish(self) -> None:
        """Join deferred step-1 artifact IO (extract_features
        defer_save) — overlapped behind steps 2/3, settled before the
        pipeline reports success. Callers driving steps individually
        (bench, tools) must call this before relying on the
        1.features artifacts."""
        fe = getattr(self, "_fe_pending", None)
        if fe is not None:
            self._fe_pending = None
            fe.wait_save()

    # ---- step 2 -----------------------------------------------------------

    def step2_train(self, names=None, abd=None, tnf=None):
        from pangaea_tpu.model import BarcodeDataset, VAE, VAETrainer
        if names is None or abd is None or tnf is None:
            self.finish()  # the disk load needs step 1's deferred write
            fe = FeatureExtractor(self.cfg.feature, self.feature_dir)
            names, abd, tnf = fe.load_features()
        os.makedirs(self.model_dir, exist_ok=True)
        ds = BarcodeDataset(names, abd, tnf)
        m = self.cfg.model
        model = VAE(abd_dim=ds.abd_dim, tnf_dim=ds.tnf_dim,
                    hidden_sizes=tuple(m.hidden_sizes),
                    latent_dim=m.latent_dim, dropout=m.dropout,
                    negative_slope=m.negative_slope,
                    matmul_dtype=m.matmul_dtype)
        trainer = VAETrainer(model, m)
        rng = np.random.RandomState(m.seed)
        params, bn = trainer.fit(ds, self.model_dir, rng=rng)
        trainer.dump_latent(ds, self.model_dir, params, bn, rng=rng)
        with open(os.path.join(self.model_dir, "model_finished"), "w") as f:
            f.write("model finished")

    # ---- step 3 -----------------------------------------------------------

    def _estimate_k(self) -> int:
        """Diversity-based auto-k (src/clustering.py:93-103): metaphlan
        shannon diversity * 8. Falls back to BIC-based selection on the
        latent when metaphlan is unavailable (greenfield: the reference
        hard-fails without its >25 GB DB)."""
        from pangaea_tpu.utils import which
        cfg = self.cfg
        if which("metaphlan") and cfg.metaphlan_db:
            from pangaea_tpu.asm.diversity import metaphlan_shannon
            reads = cfg.reads1 or cfg.interleaved_reads
            shannon = metaphlan_shannon(reads, cfg.metaphlan_db,
                                        self.cluster_dir)
            k = int(cfg.cluster.diversity_multiplier * shannon)
            log.info("estimated num_classes: %d", k)
            return k
        log.info("metaphlan unavailable; selecting k by BIC on the latent")
        from pangaea_tpu.cluster import select_k_with_bic
        emb = np.load(os.path.join(self.model_dir, "latent.npz"))["arr_0"]
        k, _, _ = select_k_with_bic(emb, kmax=100, kmin=4, ske_repeat=5,
                                    k_repeat=2, random_state=0)
        log.info("estimated num_classes: %d", k)
        return k

    def step3_cluster(self):
        from pangaea_tpu.cluster import clustering_rph_kmeans
        cfg = self.cfg
        os.makedirs(self.cluster_dir, exist_ok=True)
        out_tsv = os.path.join(self.cluster_dir, "clusters.tsv")
        out_npz = os.path.join(self.cluster_dir, "clusters.npz")
        if not os.path.isfile(out_tsv):
            emb = np.load(os.path.join(self.model_dir, "latent.npz"))["arr_0"]
            bcs = np.load(os.path.join(self.model_dir, "barcodes.npz"),
                          allow_pickle=True)["arr_0"]
            k = cfg.cluster.n_clusters or self._estimate_k()
            # seeded: the reference's rph_kmeans draws from the GLOBAL
            # np.random that init_all seeds to 2021 (utils.py:84-88), so
            # its step 3 is reproducible; ours must be too
            clusters = clustering_rph_kmeans(
                emb, k, n_init=cfg.cluster.n_init,
                random_state=cfg.model.seed,
                device_min_elems=cfg.cluster.device_min_elems)
            np.savez(out_npz, clusters)
            c2b = defaultdict(list)
            for i in range(len(bcs)):
                c2b[clusters[i]].append(str(bcs[i]))
            with open(out_tsv, "w") as tsv:
                for cid, bclist in c2b.items():
                    tsv.write("{}\t{}\n".format(cid, ",".join(bclist)))
        else:
            log.info("existing clustering result found")
        extract_reads(out_tsv, os.path.join(self.cluster_dir, "cluster"),
                      reads1=cfg.reads1, reads2=cfg.reads2,
                      interleaved=cfg.interleaved_reads)
        with open(os.path.join(self.cluster_dir, "clustering_finished"),
                  "w") as f:
            f.write("finished")

    # ---- step 4 -----------------------------------------------------------

    def step4_assemble(self):
        from pangaea_tpu.asm.final import final_assemble
        final_assemble(self.cfg, self.cluster_dir, self.assembly_dir)

    # ---- driver -----------------------------------------------------------

    def run(self) -> None:
        from pangaea_tpu.profiling import StageTimer, trace
        cfg = self.cfg
        steps = cfg.steps.split(",")
        timer = StageTimer()
        feats = None
        with trace("pipeline"):
            if "1" not in steps:
                log.info("skip step 1: feature extraction")
            elif check_step_finished(cfg.output, "1"):
                log.info("step 1: feature extraction finished")
            else:
                with timer.stage("step1_features"):
                    feats = _retry_transient(self.step1_features,
                                             "step 1 (features)")

            if "2" not in steps:
                log.info("skip step 2: training")
            elif check_step_finished(cfg.output, "2"):
                log.info("step 2: training finished")
            else:
                with timer.stage("step2_train"):
                    _retry_transient(
                        lambda: self.step2_train(
                            *(feats or (None, None, None))),
                        "step 2 (training)")

            if "3" not in steps:
                log.info("skip step 3: clustering")
            elif check_step_finished(cfg.output, "3"):
                log.info("step 3: clustering finished")
            else:
                log.info("start clustering")
                with timer.stage("step3_cluster"):
                    _retry_transient(self.step3_cluster,
                                     "step 3 (clustering)")

            if "4" not in steps:
                log.info("skip step 4: assembly")
            elif check_step_finished(cfg.output, "4"):
                log.info("step 4: assembly finished")
            else:
                log.info("start assembly")
                with timer.stage("step4_assemble"):
                    _retry_transient(self.step4_assemble,
                                     "step 4 (assembly)")
            self.finish()
        timer.dump(os.path.join(cfg.output, "metrics.json"))
        try:
            import resource
            log.info("peak RSS: %.2f GiB", resource.getrusage(
                resource.RUSAGE_SELF).ru_maxrss / (1 << 20))
        except Exception:
            pass
        log.info("program finished successfully")
