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
    # pruning schedule: fraction of mlp channels to remove, ramped over steps
    target_mlp_sparsity: float = 0.5
    prune_steps: int = 100  # steps to reach target sparsity
    total_steps: int = 200


def init_masks(cfg: ModelConfig) -> dict:
    return {
        "mlp": jnp.ones((cfg.num_hidden_layers, cfg.intermediate_size), jnp.float32),
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
        self._saliency = jnp.zeros_like(self.masks["mlp"])
        self.step_idx = 0
        self.history = []

        dcfg_t = self.dcfg.temperature
        kl_w, ce_w = self.dcfg.kl_weight, self.dcfg.ce_weight
        cfg_ = cfg

        def loss_fn(student, masks, tokens, teacher_logits):
            logits = forward_logits(student, cfg_, tokens, masks)
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
            return kl_w * kl * (dcfg_t ** 2) + ce_w * ce, (kl, ce)

        @jax.jit
        def train_step(student, opt_state, masks, tokens, teacher_logits):
            (loss, (kl, ce)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                student, masks, tokens, teacher_logits
            )
            updates, opt_state = self.opt.update(grads, opt_state, student)
            student = optax.apply_updates(student, updates)
            # mlp channel saliency: |d loss / d wdown| * |wdown| summed over E
            sal = jnp.sum(
                jnp.abs(grads["layers"]["wdown"]) * jnp.abs(student["layers"]["wdown"]),
                axis=2,
            )
            return student, opt_state, loss, kl, ce, sal

        self._train_step = train_step

        @jax.jit
        def teacher_logits_fn(teacher, tokens):
            return forward_logits(teacher, cfg_, tokens)

        self._teacher_logits = teacher_logits_fn

    # -- pruning schedule ---------------------------------------------------

    def _scheduled_sparsity(self) -> float:
        d = self.dcfg
        frac = min(1.0, self.step_idx / max(d.prune_steps, 1))
        return d.target_mlp_sparsity * frac

    def _update_masks(self) -> None:
        """Zero the lowest-saliency channels up to the scheduled count
        (reference _update_mask :674-724)."""
        I = self.cfg.intermediate_size
        n_zero = int(self._scheduled_sparsity() * I)
        if n_zero == 0:
            return
        sal = np.asarray(self._saliency)
        mask = np.ones_like(sal)
        order = np.argsort(sal, axis=1)  # ascending: least salient first
        for li in range(sal.shape[0]):
            mask[li, order[li, :n_zero]] = 0.0
        self.masks = {"mlp": jnp.asarray(mask)}

    # -- training loop ------------------------------------------------------

    def fit(self, data: Iterator[np.ndarray], steps: Optional[int] = None) -> list:
        """Run the distill loop; ``data`` yields [B, T] int32 token batches.
        Teacher logits are computed on the fly (the reference caches them to
        disk; with a jitted teacher forward the cache is optional —
        ``calc_logit``'s role)."""
        steps = steps or self.dcfg.total_steps
        for _ in range(steps):
            tokens = jnp.asarray(next(data), jnp.int32)
            t_logits = self._teacher_logits(self.teacher, tokens)
            (
                self.student, self.opt_state, loss, kl, ce, sal,
            ) = self._train_step(
                self.student, self.opt_state, self.masks, tokens, t_logits
            )
            self._saliency = 0.9 * self._saliency + 0.1 * sal
            self.step_idx += 1
            self._update_masks()
            self.history.append(
                {"step": self.step_idx, "loss": float(loss), "kl": float(kl),
                 "ce": float(ce), "sparsity": self._scheduled_sparsity()}
            )
        return self.history

    # -- reparam ------------------------------------------------------------

    def reparam(self) -> Tuple[ModelConfig, dict]:
        """Bake masks into physically smaller weights (reference
        replace_kernels/reparam :832-908). All layers keep the same pruned
        width (max across layers) so the stacked layout survives."""
        mask = np.asarray(self.masks["mlp"])  # [L, I]
        keep_counts = mask.sum(axis=1).astype(int)
        keep_n = int(keep_counts.max())
        L = mask.shape[0]
        I = self.cfg.intermediate_size
        wgu = np.asarray(self.student["layers"]["wgu"])  # [L, E, 2I]
        wdn = np.asarray(self.student["layers"]["wdown"])  # [L, I, E]
        new_wgu = np.zeros((L, wgu.shape[1], 2 * keep_n), wgu.dtype)
        new_wdn = np.zeros((L, keep_n, wdn.shape[2]), wdn.dtype)
        for li in range(L):
            kept = np.nonzero(mask[li])[0]
            if len(kept) < keep_n:  # pad with (dead) channels for stacking
                pad = np.setdiff1d(np.arange(I), kept)[: keep_n - len(kept)]
                kept = np.concatenate([kept, pad])
                dead = np.arange(len(kept) - len(pad), len(kept))
            else:
                dead = np.array([], int)
            new_wgu[li, :, :keep_n] = wgu[li][:, kept]
            new_wgu[li, :, keep_n:] = wgu[li][:, I + kept]
            new_wdn[li] = wdn[li][kept]
            if len(dead):
                new_wdn[li, dead] = 0.0
        new_cfg = dataclasses.replace(self.cfg, intermediate_size=keep_n)
        new_params = {
            k: v for k, v in self.student.items() if k != "layers"
        }
        layers = dict(self.student["layers"])
        layers["wgu"] = jnp.asarray(new_wgu)
        layers["wdown"] = jnp.asarray(new_wdn)
        new_params["layers"] = layers
        return new_cfg, new_params
