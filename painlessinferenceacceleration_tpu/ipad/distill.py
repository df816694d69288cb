"""Iterative pruning + distillation.

Reference: ipad/common/distill_worker.py —
- teacher logits cached once (calc_logit/load_logit :1080-1170),
- ``fit`` loop with distill losses (KL/CE vs teacher + hidden-state losses,
  _calc_loss :583),
- ``_update_mask`` progressively zeroes the lowest-sensitivity channels on a
  per-step schedule (:674-724, zero_counts :243-342),
- ``replace_kernels``/``reparam`` bake masks back into dense weights
  (:832-908), ``clip_layer`` depth pruning (:725).

TPU re-design: one jitted train step (loss + optax update) where masks are
pytree inputs; sensitivity is the accumulated |weight| x |activation-grad|
saliency; reparam slices weights to the kept channels and returns a smaller
ModelConfig, so the pruned model runs on the unmodified serving engine.
"""

from __future__ import annotations

import dataclasses
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from painlessinferenceacceleration_tpu.config import ModelConfig
from painlessinferenceacceleration_tpu.ipad.train_forward import forward_logits


@dataclasses.dataclass
class DistillConfig:
    lr: float = 1e-4
    weight_decay: float = 0.01
    kl_weight: float = 1.0  # KL(teacher || student) on logits
    ce_weight: float = 0.1  # CE vs data labels
    temperature: float = 2.0
    # pruning schedule: fraction of each unit class to remove, ramped over
    # steps. Heads prune at kv-group granularity (a kv head + its G query
    # heads) so the GQA layout survives; for MHA that is per-head, which is
    # the reference's SparseAttn case. Depth pruning is the reference's
    # clip_layer (:725).
    target_mlp_sparsity: float = 0.5
    target_head_sparsity: float = 0.0  # fraction of kv groups to remove
    target_depth_sparsity: float = 0.0  # fraction of layers to remove
    # fraction of the hidden/residual width to remove (the reference's
    # 'dim' mode, distill_worker.py:243-342); one mask shared by all layers
    # because the residual stream must keep one width
    target_dim_sparsity: float = 0.0
    hidden_weight: float = 0.0  # MSE(teacher_hidden, student_hidden) weight
    prune_steps: int = 100  # steps to reach target sparsity
    total_steps: int = 200


def init_masks(cfg: ModelConfig) -> dict:
    L = cfg.num_hidden_layers
    return {
        "mlp": jnp.ones((L, cfg.intermediate_size), jnp.float32),
        "head": jnp.ones((L, cfg.num_attention_heads), jnp.float32),
        "layer": jnp.ones((L,), jnp.float32),
        "dim": jnp.ones((cfg.hidden_size,), jnp.float32),
    }


class Distiller:
    """Prune-and-distill driver (reference: DistillWorker + DistillPipe)."""

    def __init__(
        self,
        cfg: ModelConfig,
        teacher_params: dict,
        dcfg: Optional[DistillConfig] = None,
        student_params: Optional[dict] = None,
    ):
        self.cfg = cfg
        self.dcfg = dcfg or DistillConfig()
        self.teacher = teacher_params
        self.student = jax.tree.map(
            lambda x: x.astype(jnp.float32), student_params or teacher_params
        )
        self.masks = init_masks(cfg)
        self.opt = optax.adamw(self.dcfg.lr, weight_decay=self.dcfg.weight_decay)
        self.opt_state = self.opt.init(self.student)
        self.tmask = self.finetune_mask("full")  # all-trainable default
        self._saliency = {k: jnp.zeros_like(v) for k, v in self.masks.items()}
        self.step_idx = 0
        self.history = []
        self._build_steps()

    def _build_steps(self) -> None:
        cfg = self.cfg
        dcfg_t = self.dcfg.temperature
        kl_w, ce_w = self.dcfg.kl_weight, self.dcfg.ce_weight
        cfg_ = cfg
        n_heads = cfg.num_attention_heads

        hid_w = self.dcfg.hidden_weight

        def loss_fn(student, masks, tokens, teacher_logits, teacher_hidden):
            logits, hidden = forward_logits(
                student, cfg_, tokens, masks, return_hidden=True
            )
            t = teacher_logits / dcfg_t
            s = logits / dcfg_t
            kl = jnp.mean(
                jnp.sum(
                    jax.nn.softmax(t, -1) * (jax.nn.log_softmax(t, -1) - jax.nn.log_softmax(s, -1)),
                    axis=-1,
                )
            )
            labels = tokens[:, 1:]
            ce = jnp.mean(
                -jnp.take_along_axis(
                    jax.nn.log_softmax(logits[:, :-1], -1), labels[..., None], axis=-1
                )
            )
            # final hidden-state alignment over KEPT dims only (the pruned
            # dims are zero by construction; reference _calc_loss :583)
            dm = masks["dim"].astype(jnp.float32)
            diff = (hidden.astype(jnp.float32) - teacher_hidden) * dm
            hid = jnp.sum(diff * diff) / (
                jnp.maximum(jnp.sum(dm), 1.0) * hidden.shape[0] * hidden.shape[1]
            )
            loss = kl_w * kl * (dcfg_t ** 2) + ce_w * ce + hid_w * hid
            return loss, (kl, ce, hid)

        @jax.jit
        def train_step(student, opt_state, masks, tokens, teacher_logits,
                       teacher_hidden, tmask):
            (loss, (kl, ce, hid)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(student, masks, tokens, teacher_logits, teacher_hidden)
            # trainable-set freezing (reference train_model modes,
            # distill_worker.py:344-430): tmask multiplies grads (so
            # optimizer moments stay zero for frozen leaves/layers) AND
            # updates (so weight decay cannot move frozen params either)
            grads = jax.tree.map(lambda g, m: g * m, grads, tmask)
            updates, opt_state = self.opt.update(grads, opt_state, student)
            updates = jax.tree.map(lambda u, m: u * m, updates, tmask)
            student = optax.apply_updates(student, updates)
            # unit saliency = accumulated |grad| * |weight| over the unit's
            # output projection (reference zero_counts :243-342)
            gd, wd = grads["layers"]["wdown"], student["layers"]["wdown"]
            go, wo = grads["layers"]["wo"], student["layers"]["wo"]
            L = wo.shape[0]
            sal = {
                "mlp": jnp.sum(jnp.abs(gd) * jnp.abs(wd), axis=2),
                "head": jnp.sum(
                    (jnp.abs(go) * jnp.abs(wo)).reshape(L, n_heads, -1), axis=2
                ),
                "layer": jnp.sum(jnp.abs(go) * jnp.abs(wo), axis=(1, 2))
                + jnp.sum(jnp.abs(gd) * jnp.abs(wd), axis=(1, 2)),
                # residual-dim saliency: every writer into a hidden dim
                # (attention + mlp outputs) over all layers
                "dim": jnp.sum(jnp.abs(go) * jnp.abs(wo), axis=(0, 1))
                + jnp.sum(jnp.abs(gd) * jnp.abs(wd), axis=(0, 1)),
            }
            return student, opt_state, loss, kl, ce, hid, sal

        self._train_step = train_step

        @jax.jit
        def teacher_logits_fn(teacher, tokens):
            return forward_logits(teacher, cfg_, tokens, return_hidden=True)

        self._teacher_logits = teacher_logits_fn

    # -- finetune trainable sets (reference train_model) --------------------

    def finetune_mask(self, mode: str = "full",
                      layer_indices=None) -> dict:
        """Multiplicative trainable-set mask mirroring the student pytree
        (reference train_model modes, distill_worker.py:344-430):

        - full:  lm head + final norm + embeddings + selected layers
        - block: selected layers only
        - upper: lm head + final norm + selected layers
        - lower: embeddings + selected layers

        ``layer_indices`` restricts which decoder layers train (the
        reference's train_layer/train_model alternation); None = all. The
        stacked [L, ...] leaves take a per-layer 0/1 vector broadcast over
        the remaining axes."""
        assert mode in ("full", "block", "upper", "lower"), mode
        L = self.cfg.num_hidden_layers
        lvec = np.zeros((L,), np.float32)
        idxs = list(layer_indices) if layer_indices is not None else range(L)
        for i in idxs:
            if 0 <= i < L:
                lvec[i] = 1.0
        head_on = 1.0 if mode in ("full", "upper") else 0.0
        emb_on = 1.0 if mode in ("full", "lower") else 0.0
        out = {}
        for k, v in self.student.items():
            if k == "layers":
                out[k] = {
                    kk: jnp.asarray(
                        lvec.reshape((L,) + (1,) * (np.ndim(vv) - 1))
                    )
                    for kk, vv in v.items()
                }
            elif k == "embed":
                out[k] = jnp.full((1,) * np.ndim(v), emb_on, jnp.float32)
            else:  # final_ln / lm_head — the reference's head+norm set
                out[k] = jnp.full((1,) * np.ndim(v), head_on, jnp.float32)
        return out

    def set_finetune(self, mode: str = "full", layer_indices=None) -> None:
        """Select the trainable set for subsequent fit() steps."""
        self.tmask = self.finetune_mask(mode, layer_indices)

    # -- pruning schedule ---------------------------------------------------

    def _scheduled_sparsity(self, target: Optional[float] = None) -> float:
        d = self.dcfg
        frac = min(1.0, self.step_idx / max(d.prune_steps, 1))
        return (d.target_mlp_sparsity if target is None else target) * frac

    def _update_masks(self) -> None:
        """Zero the lowest-saliency units up to each scheduled count
        (reference _update_mask :674-724; clip_layer :725)."""
        d = self.dcfg
        cfg = self.cfg
        masks = dict(self.masks)

        # mlp channels, per layer
        I = cfg.intermediate_size
        n_zero = int(self._scheduled_sparsity() * I)
        if n_zero:
            sal = np.asarray(self._saliency["mlp"])
            mask = np.ones_like(sal)
            order = np.argsort(sal, axis=1)  # ascending: least salient first
            for li in range(sal.shape[0]):
                mask[li, order[li, :n_zero]] = 0.0
            masks["mlp"] = jnp.asarray(mask)

        # attention heads, kv-group granularity, per layer
        H, Hk = cfg.num_attention_heads, cfg.num_key_value_heads
        G = H // Hk
        n_zero = min(int(self._scheduled_sparsity(d.target_head_sparsity) * Hk),
                     Hk - 1)
        if n_zero > 0:
            gsal = np.asarray(self._saliency["head"]).reshape(-1, Hk, G).sum(-1)
            mask = np.ones((gsal.shape[0], Hk, G), np.float32)
            order = np.argsort(gsal, axis=1)
            for li in range(gsal.shape[0]):
                mask[li, order[li, :n_zero]] = 0.0
            masks["head"] = jnp.asarray(mask.reshape(-1, H))

        # whole layers (depth)
        L = cfg.num_hidden_layers
        n_zero = min(int(self._scheduled_sparsity(d.target_depth_sparsity) * L),
                     L - 1)
        if n_zero > 0:
            lsal = np.asarray(self._saliency["layer"])
            mask = np.ones((L,), np.float32)
            mask[np.argsort(lsal)[:n_zero]] = 0.0
            masks["layer"] = jnp.asarray(mask)

        # hidden/residual dims, one mask for the whole stack
        E = cfg.hidden_size
        n_zero = min(int(self._scheduled_sparsity(d.target_dim_sparsity) * E),
                     E - 1)
        if n_zero > 0:
            dsal = np.asarray(self._saliency["dim"])
            mask = np.ones((E,), np.float32)
            mask[np.argsort(dsal)[:n_zero]] = 0.0
            masks["dim"] = jnp.asarray(mask)

        self.masks = masks

    # -- training loop ------------------------------------------------------

    def _teacher_cached(self, tokens, cache_dir):
        """Teacher logits+hidden, disk-cached by token-batch hash (the
        reference's calc_logit/load_logit teacher cache,
        distill_worker.py:1080-1170 — lets repeated epochs / resumed runs
        skip the teacher forward)."""
        if cache_dir is None:
            return self._teacher_logits(self.teacher, tokens)
        import hashlib
        import os

        key = hashlib.sha1(np.asarray(tokens).tobytes()).hexdigest()[:20]
        path = os.path.join(cache_dir, f"teacher_{key}.npz")
        if os.path.exists(path):
            z = np.load(path)
            return jnp.asarray(z["logits"]), jnp.asarray(z["hidden"])
        lg, hd = self._teacher_logits(self.teacher, tokens)
        os.makedirs(cache_dir, exist_ok=True)
        np.savez(path, logits=np.asarray(lg), hidden=np.asarray(hd))
        return lg, hd

    def fit(self, data: Iterator[np.ndarray], steps: Optional[int] = None,
            cache_dir: Optional[str] = None) -> list:
        """Run the distill loop; ``data`` yields [B, T] int32 token batches.
        ``cache_dir`` caches teacher logits to disk (reference calc_logit /
        load_logit); without it the jitted teacher forward runs per batch."""
        steps = steps or self.dcfg.total_steps
        for _ in range(steps):
            tokens = jnp.asarray(next(data), jnp.int32)
            t_logits, t_hidden = self._teacher_cached(tokens, cache_dir)
            (
                self.student, self.opt_state, loss, kl, ce, hid, sal,
            ) = self._train_step(
                self.student, self.opt_state, self.masks, tokens, t_logits,
                t_hidden.astype(jnp.float32), self.tmask,
            )
            self._saliency = {
                k: 0.9 * self._saliency[k] + 0.1 * sal[k] for k in sal
            }
            self.step_idx += 1
            self._update_masks()
            self.history.append(
                {"step": self.step_idx, "loss": float(loss), "kl": float(kl),
                 "ce": float(ce), "hidden": float(hid),
                 "sparsity": self._scheduled_sparsity()}
            )
        return self.history

    # -- eval ----------------------------------------------------------------

    def evaluate(self, data: Iterator[np.ndarray], batches: int = 4) -> dict:
        """Teacher-vs-student quality probe (the reference's chat/batch_chat
        eval, distill_worker.py:1230-1332, without a tokenizer): next-token
        perplexity of both models and their greedy top-1 agreement."""
        t_nll = s_nll = agree = count = 0.0
        for _ in range(batches):
            tokens = jnp.asarray(next(data), jnp.int32)
            t_logits, _ = self._teacher_logits(self.teacher, tokens)
            s_logits, _ = forward_logits(
                self.student, self.cfg, tokens, self.masks, return_hidden=True
            )
            labels = np.asarray(tokens[:, 1:])
            for logits, acc in ((t_logits, "t"), (s_logits, "s")):
                lp = jax.nn.log_softmax(np.asarray(logits[:, :-1]), axis=-1)
                nll = -np.take_along_axis(
                    np.asarray(lp), labels[..., None], axis=-1
                ).mean()
                if acc == "t":
                    t_nll += float(nll)
                else:
                    s_nll += float(nll)
            agree += float(
                (np.asarray(t_logits[:, :-1]).argmax(-1)
                 == np.asarray(s_logits[:, :-1]).argmax(-1)).mean()
            )
            count += 1
        return {
            "teacher_ppl": float(np.exp(t_nll / count)),
            "student_ppl": float(np.exp(s_nll / count)),
            "top1_agreement": agree / count,
        }

    # -- staging support (DistillPipe) ---------------------------------------

    def set_stage(self, dcfg: "DistillConfig") -> None:
        """Swap the schedule/loss config and restart the stage clock +
        optimizer (the reference rebuilds the optimizer per train_layer /
        train_model stage, distill_worker.py:243-430). Masks accumulated by
        earlier stages are preserved: kinds with a zero target are left
        untouched by _update_masks."""
        self.dcfg = dcfg
        self.step_idx = 0
        self.opt = optax.adamw(dcfg.lr, weight_decay=dcfg.weight_decay)
        self.opt_state = self.opt.init(self.student)
        # loss weights live in the jitted closures via self.dcfg snapshots —
        # rebuild the step functions for the new stage
        self._build_steps()

    # -- checkpointing -------------------------------------------------------

    def save(self, path: str) -> None:
        """Persist student/opt/masks/saliency/step for resume (reference
        save_pretrained + optimizer state, distill_worker.py:1341)."""
        import pickle

        state = {
            "student": jax.tree.map(np.asarray, self.student),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "masks": {k: np.asarray(v) for k, v in self.masks.items()},
            "saliency": {k: np.asarray(v) for k, v in self._saliency.items()},
            "step_idx": self.step_idx,
            "history": self.history,
        }
        with open(path, "wb") as f:
            pickle.dump(state, f)

    def load(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            state = pickle.load(f)
        self.student = jax.tree.map(jnp.asarray, state["student"])
        self.opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        self.masks = {k: jnp.asarray(v) for k, v in state["masks"].items()}
        self._saliency = {
            k: jnp.asarray(v) for k, v in state["saliency"].items()
        }
        self.step_idx = state["step_idx"]
        self.history = list(state["history"])

    # -- reparam ------------------------------------------------------------

    def reparam(self) -> Tuple[ModelConfig, dict]:
        """Bake masks into physically smaller weights (reference
        replace_kernels/reparam :832-908, clip_layer :725). All layers keep
        the same pruned width (max across layers, dead-padded with zeroed
        output rows) so the stacked [L, ...] layout survives."""
        cfg = self.cfg
        H, Hk, D, I = (
            cfg.num_attention_heads,
            cfg.num_key_value_heads,
            cfg.head_dim,
            cfg.intermediate_size,
        )
        G = H // Hk
        layers = {k: np.asarray(v) for k, v in self.student["layers"].items()}
        mlp_mask = np.asarray(self.masks["mlp"])
        head_mask = np.asarray(self.masks["head"])

        # 1) depth: drop masked layers from every stacked leaf
        keep_l = np.nonzero(np.asarray(self.masks["layer"]))[0]
        L = len(keep_l)
        if L < cfg.num_hidden_layers:
            layers = {k: v[keep_l] for k, v in layers.items()}
            mlp_mask, head_mask = mlp_mask[keep_l], head_mask[keep_l]

        def kept_padded(mask_row, n_units, keep_n):
            kept = np.nonzero(mask_row)[0]
            if len(kept) < keep_n:  # pad with dead units for stacking
                pad = np.setdiff1d(np.arange(n_units), kept)[: keep_n - len(kept)]
                kept = np.concatenate([kept, pad])
                dead = np.arange(len(kept) - len(pad), len(kept))
            else:
                dead = np.array([], int)
            return kept, dead

        # 2) attention: kv-group slicing (a group = kv head + its G q heads)
        gmask = head_mask.reshape(L, Hk, G).max(-1)
        keep_g = int(gmask.sum(1).max())
        nH = keep_g * G
        if keep_g < Hk:
            wqkv, wo = layers["wqkv"], layers["wo"]
            new_wqkv = np.zeros(
                (L, wqkv.shape[1], (nH + 2 * keep_g) * D), wqkv.dtype
            )
            new_wo = np.zeros((L, nH * D, wo.shape[2]), wo.dtype)
            bqkv = layers.get("bqkv")
            new_bqkv = (
                np.zeros((L, (nH + 2 * keep_g) * D), bqkv.dtype)
                if bqkv is not None else None
            )
            for li in range(L):
                kept, dead = kept_padded(gmask[li], Hk, keep_g)
                qc = np.concatenate(
                    [np.arange(g * G * D, (g + 1) * G * D) for g in kept]
                )
                kc = np.concatenate(
                    [H * D + np.arange(g * D, (g + 1) * D) for g in kept]
                )
                vc = np.concatenate(
                    [(H + Hk) * D + np.arange(g * D, (g + 1) * D) for g in kept]
                )
                cols = np.concatenate([qc, kc, vc])
                new_wqkv[li] = wqkv[li][:, cols]
                new_wo[li] = wo[li][qc]
                for dg in dead:  # dead groups contribute nothing
                    new_wo[li, dg * G * D : (dg + 1) * G * D] = 0.0
                if new_bqkv is not None:
                    new_bqkv[li] = bqkv[li][cols]
            layers["wqkv"], layers["wo"] = new_wqkv, new_wo
            if new_bqkv is not None:
                layers["bqkv"] = new_bqkv

        # 3) mlp channel slicing
        keep_n = int(mlp_mask.sum(axis=1).max())
        if keep_n < I:
            wgu, wdn = layers["wgu"], layers["wdown"]  # [L,E,2I], [L,I,E]
            new_wgu = np.zeros((L, wgu.shape[1], 2 * keep_n), wgu.dtype)
            new_wdn = np.zeros((L, keep_n, wdn.shape[2]), wdn.dtype)
            for li in range(L):
                kept, dead = kept_padded(mlp_mask[li], I, keep_n)
                new_wgu[li, :, :keep_n] = wgu[li][:, kept]
                new_wgu[li, :, keep_n:] = wgu[li][:, I + kept]
                new_wdn[li] = wdn[li][kept]
                if len(dead):
                    new_wdn[li, dead] = 0.0
            layers["wgu"], layers["wdown"] = new_wgu, new_wdn

        # 4) hidden/residual width (dim mode): one kept-index set slices
        # every E-sized axis; _masked_rms_norm makes this slice EXACT (the
        # masked student computes the same numbers the sliced model will)
        top = {k: np.asarray(v) for k, v in self.student.items() if k != "layers"}
        dim_mask = np.asarray(self.masks["dim"])
        keep_e = int(dim_mask.sum())
        E = cfg.hidden_size
        if keep_e < E:
            kd = np.nonzero(dim_mask)[0]
            top["embed"] = top["embed"][:, kd]
            top["final_ln"] = top["final_ln"][kd]
            if "lm_head" in top:
                top["lm_head"] = top["lm_head"][kd]
            layers["input_ln"] = layers["input_ln"][:, kd]
            layers["post_ln"] = layers["post_ln"][:, kd]
            layers["wqkv"] = layers["wqkv"][:, kd, :]
            layers["wo"] = layers["wo"][:, :, kd]
            layers["wgu"] = layers["wgu"][:, kd, :]
            layers["wdown"] = layers["wdown"][:, :, kd]
            if "bo" in layers:
                layers["bo"] = layers["bo"][:, kd]

        new_cfg = dataclasses.replace(
            self.cfg,
            num_hidden_layers=L,
            num_attention_heads=nH,
            num_key_value_heads=keep_g,
            intermediate_size=keep_n,
            hidden_size=keep_e,
            head_dim=cfg.head_dim,  # unchanged; hidden_size no longer H*D
        )
        new_params = {k: jnp.asarray(v) for k, v in top.items()}
        new_params["layers"] = {k: jnp.asarray(v) for k, v in layers.items()}
        return new_cfg, new_params


@dataclasses.dataclass
class DistillStage:
    """One pipeline stage (reference: a train_layer mode or train_model
    finetune — distill_worker.py:243-430)."""

    mode: str  # mlp | head | depth | dim | finetune
    sparsity: float = 0.0  # pruning target for this stage's mode
    steps: int = 100
    prune_steps: int = 50
    lr: float = 1e-4
    hidden_weight: float = 0.0
    # finetune stages: the reference train_model trainable set
    # (full/block/upper/lower, distill_worker.py:344-430) and optional
    # layer restriction (train_layer alternation)
    finetune_mode: str = "full"
    layer_indices: Optional[Tuple[int, ...]] = None


class DistillPipe:
    """Multi-stage prune-then-distill pipeline (reference DistillPipe,
    distill_worker.py:1447): e.g. prune mlp channels, then attention
    heads, then finetune without pruning — masks accumulate across stages
    (a stage only tightens its own mode's mask), one final reparam."""

    def __init__(self, cfg: ModelConfig, teacher_params: dict,
                 stages: list):
        self.stages = list(stages)
        self.distiller = Distiller(cfg, teacher_params, DistillConfig())

    @staticmethod
    def _stage_cfg(st: DistillStage) -> DistillConfig:
        kw = dict(lr=st.lr, hidden_weight=st.hidden_weight,
                  prune_steps=st.prune_steps, total_steps=st.steps,
                  target_mlp_sparsity=0.0)
        key = {
            "mlp": "target_mlp_sparsity",
            "head": "target_head_sparsity",
            "depth": "target_depth_sparsity",
            "dim": "target_dim_sparsity",
            "finetune": None,
        }[st.mode]
        if key is not None:
            kw[key] = st.sparsity
        return DistillConfig(**kw)

    def run(self, data: Iterator[np.ndarray], cache_dir=None):
        """Run every stage; returns (new_cfg, new_params, history)."""
        d = self.distiller
        for st in self.stages:
            d.set_stage(self._stage_cfg(st))
            if st.mode == "finetune":
                d.set_finetune(st.finetune_mode, st.layer_indices)
            else:
                d.set_finetune("full")  # prune stages train everything
            d.fit(data, steps=st.steps, cache_dir=cache_dir)
        new_cfg, new_params = d.reparam()
        return new_cfg, new_params, d.history
