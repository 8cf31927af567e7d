"""Evaluation pipeline: the reference's t2m_eval + test protocol.

Parity targets:
  per-batch eval     — mld/models/modeltype/mld.py:618-708 (t2m_eval)
  replication loop   — test.py:116-139 (20x, mean ± 1.96*std/sqrt(n))
  gt evaluation      — mld.py:771-809 (eval_gt)

One jitted program per batch: CFG text encode -> DDIM scan -> VAE decode ->
joints + renorm -> length-sorted GRU evaluator embeddings. Metric
accumulation and FID stay on host (scipy sqrtm), as in the reference.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mld_tpu.config import Config
from mld_tpu.metrics import (
    ComputeMetrics,
    MMMetrics,
    MRMetrics,
    TM2TMetrics,
    UncondMetrics,
)
from mld_tpu.models.mld import MLD
from mld_tpu.models.t2m_eval import (
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
)


class T2MEvaluatorBundle:
    """The three frozen t2m evaluator nets + params."""

    def __init__(self, cfg: Config, params: Optional[Dict] = None,
                 seed: int = 0):
        nfeats = cfg.dataset.nfeats
        self.textencoder = TextEncoderBiGRUCo(300, 15, 512, 512)
        self.moveencoder = MovementConvEncoder(nfeats - 4, 512, 512)
        self.motionencoder = MotionEncoderBiGRUCo(512, 1024, 512)
        if params is None:
            import os
            npz = getattr(cfg.eval, "t2m_params_path", "")
            tar = f"{cfg.model.t2m_path}/t2m/text_mot_match/model/finest.tar"
            if npz and os.path.exists(npz):
                from mld_tpu.utils.checkpoint import load_params_npz
                params = load_params_npz(npz)
            elif os.path.exists(tar):
                from mld_tpu.models.t2m_eval import convert_t2m_checkpoint
                conv = convert_t2m_checkpoint(tar)
                params = {"text": conv["textencoder"],
                          "move": conv["movementencoder"],
                          "motion": conv["motionencoder"]}
            else:  # random init (synthetic pipelines / smoke tests)
                rngs = jax.random.split(jax.random.PRNGKey(seed), 3)
                T = 16
                params = {
                    "text": self.textencoder.init(
                        rngs[0], jnp.zeros((1, T, 300)),
                        jnp.zeros((1, T, 15)), jnp.ones((1,), jnp.int32)
                    )["params"],
                    "move": self.moveencoder.init(
                        rngs[1], jnp.zeros((1, T, nfeats - 4)))["params"],
                    "motion": self.motionencoder.init(
                        rngs[2], jnp.zeros((1, T, 512)),
                        jnp.ones((1,), jnp.int32))["params"],
                }
        self.params = params

    def motion_embedding(self, feats, m_lens):
        # the measuring stick stays f32: serving-precision knobs
        # (MLD_TPU_MATMUL_PRECISION / _STAGE_PRECISION) must only affect
        # the generator under evaluation, never the evaluator networks —
        # otherwise reported FID/R-precision deltas conflate the two
        # (precision-study arms, scripts/precision_study.py)
        with jax.default_matmul_precision("highest"):
            mov = self.moveencoder.apply({"params": self.params["move"]},
                                         feats[..., :-4])
            return self.motionencoder.apply(
                {"params": self.params["motion"]}, mov, m_lens)

    def text_embedding(self, word_embs, pos_ohot, text_lens):
        with jax.default_matmul_precision("highest"):
            return self.textencoder.apply({"params": self.params["text"]},
                                          word_embs, pos_ohot, text_lens)


class Evaluator:
    def __init__(self, cfg: Config, mld: MLD, datamodule,
                 t2m_params: Optional[Dict] = None):
        self.cfg = cfg
        self.mld = mld
        self.dm = datamodule
        self.is_a2m = cfg.model.condition == "action"
        self.bundle = (None if self.is_a2m
                       else T2MEvaluatorBundle(cfg, t2m_params))
        self.unit_len = cfg.dataset.unit_len
        self._eval_batch_jit = jax.jit(self._eval_batch,
                                       static_argnames=("stage",))
        self._a2m_batch_jit = jax.jit(self._a2m_batch,
                                      static_argnames=("stage",))

    # ------------------------------------------------------------- jitted core
    def _eval_batch(self, params, text_ids, word_embs, pos_ohot, text_lens,
                    motion, mask, lengths, rng, stage: str = "diffusion"):
        mld = self.mld
        if stage == "diffusion":
            feats_rst = mld._generate_impl(params, text_ids, mask, rng)
        else:  # vae reconstruction (stage-1 eval)
            z, _ = mld.encode_motion(params, motion, mask, rng)
            feats_rst = mld.decode_latent(params, z, mask)

        joints_rst = mld.feats2joints(feats_rst) * mask[..., None, None]
        joints_ref = mld.feats2joints(motion) * mask[..., None, None]

        # evaluator-space renorm + length-desc sort (mld.py:676-688)
        feats_rst_e = mld.renorm4t2m(feats_rst)
        motion_e = mld.renorm4t2m(motion)
        align = jnp.argsort(-lengths)
        motion_e = motion_e[align]
        feats_rst_e = feats_rst_e[align]
        m_lens = lengths[align] // self.unit_len

        lat_rm = self.bundle.motion_embedding(feats_rst_e, m_lens)
        lat_m = self.bundle.motion_embedding(motion_e, m_lens)
        lat_t = self.bundle.text_embedding(word_embs, pos_ohot,
                                           text_lens)[align]
        return {
            "lat_t": lat_t, "lat_m": lat_m, "lat_rm": lat_rm,
            "joints_rst": joints_rst, "joints_ref": joints_ref,
            "align": align,
        }

    def _a2m_batch(self, params, actions, motion, mask, rng,
                   stage: str = "diffusion"):
        """Action-to-motion eval core (mld.py:710-760 a2m_eval as one XLA
        program): generate (or VAE-reconstruct), decode, SMPL-topology
        joints for the frozen classifiers."""
        mld = self.mld
        if stage == "diffusion":
            feats_rst = mld._generate_impl(params, actions, mask, rng)
        else:  # vae reconstruction
            z, _ = mld.encode_motion(params, motion, mask, rng)
            feats_rst = mld.decode_latent(params, z, mask)
        # rot2joints with translation = the reference's feats2joints_eval
        # (jointstype='smpl', vertstrans=True, mld.py:120-131)
        joints_rst = mld.feats2joints(feats_rst, mask)
        joints_ref = mld.feats2joints(motion, mask)
        return {"feats_rst": feats_rst, "joints_rst": joints_rst,
                "joints_ref": joints_ref}

    def _make_a2m_accumulator(self, diversity_times: int):
        """HUMANACT/UESTC metric accumulator; frozen classifier from the
        reference checkpoint when the asset exists (modeltype/base.py:154,
        metrics/stgcn.py:41), random-init otherwise (synthetic/offline)."""
        import os
        cfg = self.cfg
        mm_times = cfg.eval.mm_num_times
        if cfg.dataset.name.lower() == "uestc":
            from mld_tpu.metrics import UESTCMetrics
            tar = os.path.join(cfg.model.uestc_rec_path,
                               "uestc_rot6d_stgcn.tar")
            if os.path.exists(tar):
                return UESTCMetrics.from_checkpoint(
                    tar, num_labels=cfg.model.nclasses,
                    diversity_times=diversity_times,
                    multimodality_times=mm_times)
            return UESTCMetrics(num_labels=cfg.model.nclasses,
                                diversity_times=diversity_times,
                                multimodality_times=mm_times)
        from mld_tpu.metrics import HUMANACTMetrics
        tar = os.path.join(cfg.model.humanact12_rec_path,
                           "humanact12_gru.tar")
        if os.path.exists(tar):
            return HUMANACTMetrics.from_checkpoint(
                tar, num_labels=cfg.model.nclasses,
                diversity_times=diversity_times,
                multimodality_times=mm_times)
        # trained-in-repo flax classifier (eval/a2m_train.py) — the
        # synthetic-corpus stand-in for the reference's frozen
        # action-recognition checkpoint; random-init only as last resort
        # (its accuracy is chance and FID ordering means nothing)
        npz = os.path.join(cfg.model.humanact12_rec_path,
                           "humanact12_gru_params.npz")
        if os.path.exists(npz):
            from mld_tpu.utils.checkpoint import load_params_npz
            return HUMANACTMetrics(params=load_params_npz(npz),
                                   num_labels=cfg.model.nclasses,
                                   diversity_times=diversity_times,
                                   multimodality_times=mm_times)
        return HUMANACTMetrics(num_labels=cfg.model.nclasses,
                               diversity_times=diversity_times,
                               multimodality_times=mm_times)

    def run_split_a2m(self, params, loader, rng, stage="diffusion",
                      compute_rng: Optional[np.random.RandomState] = None,
                      diversity_times: Optional[int] = None,
                      prediction_sink=None) -> Dict:
        """One metric pass over the a2m test split (allsplit_step a2m branch,
        mld.py:875-907): accuracy/FID/Diversity/Multimodality through the
        frozen HumanAct12-GRU or UESTC-ST-GCN classifier."""
        cfg = self.cfg
        acc = self._make_a2m_accumulator(
            diversity_times or cfg.eval.diversity_times)
        is_uestc = cfg.dataset.name.lower() == "uestc"
        for batch in loader:
            rng, srng = jax.random.split(rng)
            motion = np.asarray(batch["motion"])
            mask = np.asarray(batch["mask"])
            actions = np.asarray(batch["action"])
            lengths = np.asarray(batch["length"])
            n_real = motion.shape[0]
            target_b = cfg.eval.batch_size
            if n_real < target_b:  # pad ragged tail; sliced off below
                pad_n = target_b - n_real
                motion = np.concatenate(
                    [motion, np.zeros((pad_n,) + motion.shape[1:],
                                      motion.dtype)], 0)
                mask = np.concatenate(
                    [mask, np.zeros((pad_n,) + mask.shape[1:], mask.dtype)],
                    0)
                actions = np.concatenate(
                    [actions, np.zeros(pad_n, actions.dtype)])
            out = self._a2m_batch_jit(params, jnp.asarray(actions),
                                      jnp.asarray(motion), jnp.asarray(mask),
                                      srng, stage=stage)
            out = {k: np.asarray(v)[:n_real] for k, v in out.items()}
            if prediction_sink is not None:
                prediction_sink(out["joints_rst"], lengths)
            if is_uestc:
                # ST-GCN consumes rot6d rotations [B, V=24, 6, T]
                # (base.py:895-903; our feature layout is [25 joints, 6])
                def to_rots(feats):
                    B, T, _ = feats.shape
                    x = feats.reshape(B, T, 25, 6)[:, :, :24]
                    return np.transpose(x, (0, 2, 3, 1))
                acc.update(actions[:n_real], to_rots(out["feats_rst"]),
                           to_rots(np.asarray(batch["motion"])), lengths)
            else:
                acc.update(actions[:n_real], out["joints_rst"],
                           out["joints_ref"], lengths)
        return acc.compute(rng=compute_rng)

    def _eval_gt_batch(self, word_embs, pos_ohot, text_lens, motion, mask,
                       lengths):
        """Ground-truth-only evaluation (mld.py:771-809 eval_gt)."""
        mld = self.mld
        joints_ref = mld.feats2joints(motion) * mask[..., None, None]
        motion_e = mld.renorm4t2m(motion)
        align = jnp.argsort(-lengths)
        motion_e = motion_e[align]
        m_lens = lengths[align] // self.unit_len
        lat_m = self.bundle.motion_embedding(motion_e, m_lens)
        lat_t = self.bundle.text_embedding(word_embs, pos_ohot,
                                           text_lens)[align]
        return {"lat_t": lat_t, "lat_m": lat_m, "joints_ref": joints_ref,
                "align": align}

    def run_gt(self, params, loader, rng) -> Dict:
        """GT-vs-GT metric run (upper-bound / dataset statistics)."""
        del params
        acc = TM2TMetrics(R_size=self.cfg.eval.r_size,
                          diversity_times=self.cfg.eval.diversity_times)
        fn = jax.jit(self._eval_gt_batch)
        for batch in loader:
            out = fn(jnp.asarray(batch["word_embs"]),
                     jnp.asarray(batch["pos_ohot"]),
                     jnp.asarray(batch["text_len"]),
                     jnp.asarray(batch["motion"]),
                     jnp.asarray(batch["mask"]),
                     jnp.asarray(batch["length"]))
            lengths = np.asarray(batch["length"])[np.asarray(out["align"])]
            acc.update(np.asarray(out["lat_t"]), np.asarray(out["lat_m"]),
                       np.asarray(out["lat_m"]), lengths)
        return acc.compute()

    # ------------------------------------------------------------- host driver
    def run_split(self, params, loader, rng, stage="diffusion",
                  metrics=("TM2TMetrics", "TemosMetric"),
                  mm: bool = False, mesh=None,
                  compute_rng: Optional[np.random.RandomState] = None,
                  diversity_times: Optional[int] = None,
                  prediction_sink=None) -> Dict:
        """`mesh`: optional jax.sharding.Mesh — batch axis sharded over its
        "data" axis (multi-chip serving-scale eval; the reference evaluates
        single-GPU only, test.py forces 1 device)."""
        cfg = self.cfg
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            batch_sh = NamedSharding(mesh, P("data"))
            params = jax.device_put(
                params, NamedSharding(mesh, P()))

        def place(x):
            return (jax.device_put(jnp.asarray(x), batch_sh)
                    if mesh is not None else jnp.asarray(x))
        div_times = diversity_times or cfg.eval.diversity_times
        accs = {}
        if "TM2TMetrics" in metrics:
            accs["TM2TMetrics"] = TM2TMetrics(
                R_size=cfg.eval.r_size,
                diversity_times=div_times)
        if "TemosMetric" in metrics:
            ds = cfg.dataset.name.lower()
            if ds not in ("humanml3d", "kit"):
                # a2m datasets must not silently route through the KIT
                # jointstype (reference raises too, mld.py:856-864)
                raise TypeError(
                    "APE/AVE metrics only support humanml3d and kit")
            accs["TemosMetric"] = ComputeMetrics(
                njoints=cfg.dataset.njoints,
                jointstype="humanml3d" if ds == "humanml3d" else "mmm")
        if "MRMetrics" in metrics:
            accs["MRMetrics"] = MRMetrics(njoints=cfg.dataset.njoints)
        if "UncondMetrics" in metrics:
            accs["UncondMetrics"] = UncondMetrics(
                diversity_times=div_times)
        if mm:
            accs = {"MMMetrics": MMMetrics(
                mm_num_times=cfg.eval.mm_num_times)}

        for batch in loader:
            rng, srng = jax.random.split(rng)
            inputs = {k: np.asarray(batch[k]) for k in
                      ("text_ids", "word_embs", "pos_ohot", "motion",
                       "mask")}
            lengths = np.asarray(batch["length"])
            text_lens = np.asarray(batch["text_len"])
            if mm:
                reps = self.cfg.eval.mm_num_repeats
                inputs = {k: np.repeat(v, reps, axis=0)
                          for k, v in inputs.items()}
                lengths = np.repeat(lengths, reps, axis=0)
                text_lens = np.repeat(text_lens, reps, axis=0)

            # pad ragged final batches to the fixed eval batch size so the
            # jitted program compiles once per split (padded rows get
            # length 0 => sorted last by the in-graph align, dropped below)
            n_real = inputs["motion"].shape[0]
            target_b = cfg.eval.batch_size if not mm else n_real
            if n_real < target_b:
                pad_n = target_b - n_real
                inputs = {k: np.concatenate(
                    [v, np.zeros((pad_n,) + v.shape[1:], v.dtype)], 0)
                    for k, v in inputs.items()}
                lengths = np.concatenate(
                    [lengths, np.zeros(pad_n, lengths.dtype)])
                text_lens = np.concatenate(
                    [text_lens, np.ones(pad_n, text_lens.dtype)])

            inputs = {k: place(v) for k, v in inputs.items()}
            out = self._eval_batch_jit(
                params, inputs["text_ids"], inputs["word_embs"],
                inputs["pos_ohot"], place(text_lens), inputs["motion"],
                inputs["mask"], place(lengths), srng, stage=stage)
            out = {k: np.asarray(v) for k, v in out.items()}
            align = out["align"]
            real_sorted = align < n_real          # padded rows sort last
            sorted_lengths = lengths[align][real_sorted]

            if prediction_sink is not None:
                # the EXACT motions the metrics below are computed on
                # (reference saves evaluated outputs, base.py:184)
                prediction_sink(out["joints_rst"][:n_real],
                                lengths[:n_real])
            if mm:
                accs["MMMetrics"].update(out["lat_rm"][None],
                                         np.asarray(batch["length"]))
                continue
            if "TM2TMetrics" in accs:
                accs["TM2TMetrics"].update(out["lat_t"][real_sorted],
                                           out["lat_rm"][real_sorted],
                                           out["lat_m"][real_sorted],
                                           sorted_lengths)
            if "TemosMetric" in accs:
                accs["TemosMetric"].update(out["joints_rst"][:n_real],
                                           out["joints_ref"][:n_real],
                                           lengths[:n_real])
            if "MRMetrics" in accs:
                accs["MRMetrics"].update(out["joints_rst"][:n_real],
                                         out["joints_ref"][:n_real],
                                         lengths[:n_real])
            if "UncondMetrics" in accs:
                accs["UncondMetrics"].update(out["lat_m"][real_sorted],
                                             sorted_lengths,
                                             out["lat_rm"][real_sorted])

        results = {}
        for name, acc in accs.items():
            try:
                results.update(acc.compute(rng=compute_rng))
            except TypeError:  # metric without an rng-aware compute
                results.update(acc.compute())
        return results

    def run(self, params, rng, replication_times: Optional[int] = None,
            stage="diffusion", with_mm: bool = True,
            prediction_sink=None) -> Dict:
        """Full test protocol: N replications, mean ± 95% interval.

        `prediction_sink(joints, lengths)`: called per batch of the FIRST
        replication's main pass with the evaluated generations — the
        --save_predictions hook (reference modeltype/base.py:184)."""
        cfg = self.cfg
        replication_times = replication_times or cfg.test.replication_times
        all_metrics: Dict[str, list] = {}
        for rep in range(replication_times):
            rng, r1, r2 = jax.random.split(rng, 3)
            # fresh host rng per replication: the reference draws a new
            # mm sample subset and metric shuffle each time (test.py:116-131);
            # reusing seed 0 would understate the reported conf95 intervals
            rep_rng = np.random.RandomState(rep)
            sink = prediction_sink if rep == 0 else None
            loader = self.dm.loader("test", shuffle=False,
                                    batch_size=cfg.eval.batch_size)
            if self.is_a2m:
                res = self.run_split_a2m(params, loader, r1, stage=stage,
                                         compute_rng=rep_rng,
                                         prediction_sink=sink)
                for k, v in res.items():
                    all_metrics.setdefault(k, []).append(float(v))
                continue
            res = self.run_split(params, loader, r1, stage=stage,
                                 metrics=tuple(cfg.eval.metrics),
                                 compute_rng=rep_rng,
                                 prediction_sink=sink)
            if with_mm and "TM2TMetrics" in cfg.eval.metrics:
                self.dm.mm_mode(True, cfg.eval.mm_num_samples, rng=rep_rng)
                mm_loader = self.dm.loader("test", shuffle=False)
                res.update(self.run_split(params, mm_loader, r2,
                                          stage=stage, mm=True,
                                          compute_rng=rep_rng))
                self.dm.mm_mode(False)
            for k, v in res.items():
                all_metrics.setdefault(k, []).append(float(v))

        out = {}
        for k, vals in all_metrics.items():
            arr = np.asarray(vals)
            out[k] = float(arr.mean())
            out[f"{k}/conf95"] = float(1.96 * arr.std() / np.sqrt(len(arr)))
        return out
