"""Reference-API model wrappers (``MODEL_REGISTRY`` layer).

The TPU framework's native training surface is the functional
``Trainer``/``train_step`` stack, but the reference exposes an imperative
wrapper API that downstream code scripts against
(``basicsr/models/image_restoration_model.py``, ``lowlight_model.py``,
``models/__init__.py:37-78``). This module provides that API 1:1:

- :func:`create_model(opt)` — MODEL_REGISTRY lookup from ``model_type``.
- :class:`ImageRestorationModel` — ``feed_data / optimize_parameters /
  test / grids / grids_inverse / validation / save / resume_training /
  get_current_log`` driving the jitted functional core underneath.
- :class:`LowlightModel` — the simpler registered alternative wrapper
  (pixel + optional perceptual/ssim losses via ``build_loss``).

Batches are NHWC here (framework convention); ``feed_data`` accepts the
reference's key set ``lq/gt/short_raw/long_raw/short_obs/expo_ratio``.
"""

from __future__ import annotations

import logging
import os
from collections import OrderedDict
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.losses import HybridLossPlus, build_loss
from lowlight_image_enhancement_tpu.models import define_network
from lowlight_image_enhancement_tpu.training import checkpoint as ckpt
from lowlight_image_enhancement_tpu.training.schedules import make_schedule
from lowlight_image_enhancement_tpu.training.train_step import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
)
from lowlight_image_enhancement_tpu.training.trainer import build_hybrid_loss
from lowlight_image_enhancement_tpu.training.validation import (
    compute_metrics,
    tiled_inference,
)
from lowlight_image_enhancement_tpu.utils.registry import MODEL_REGISTRY

logger = logging.getLogger(__name__)


def _net_input_channels(net_opt: Mapping[str, Any]) -> int:
    """Channel count of the network's input for shape-only param init.

    Stereo archs (NAFSSR) consume both views concatenated channelwise, so
    their input is ``2*img_channel`` (``models/nafssr.py:NAFSSR``); every
    other arch takes ``img_channel``/``in_channels`` directly."""
    t = str(net_opt.get("type", ""))
    c = int(net_opt.get("img_channel", net_opt.get("in_channels", 3)))
    return 2 * c if ("SSR" in t or "Stereo" in t) else c


def create_model(opt: Mapping[str, Any]):
    """Instantiate a model wrapper from ``opt['model_type']``
    (reference ``models/__init__.py:37-78``)."""
    model_type = opt["model_type"]
    return MODEL_REGISTRY.get(model_type)(opt)


class _BaseWrapper:
    """Shared wrapper plumbing (reference ``BaseModel``)."""

    def __init__(self, opt: Mapping[str, Any]):
        self.opt = dict(opt)
        self.is_train = opt.get("is_train", True)
        self.log_dict: Dict[str, float] = OrderedDict()
        self.batch: Dict[str, Any] = {}
        self.output = None

    # -- checkpointing (reference save/resume surface) ------------------
    def save(self, epoch: int = -1, current_iter: int = -1) -> None:
        paths = self.opt.get("path", {})
        if paths.get("training_states"):
            os.makedirs(paths["training_states"], exist_ok=True)
            ckpt.save_training_state(paths["training_states"], self.state)
        if paths.get("models"):
            os.makedirs(paths["models"], exist_ok=True)
            ckpt.save_network(paths["models"], self.state)

    def resume_training(self, resume_state_path: Optional[str] = None) -> int:
        paths = self.opt.get("path", {})
        if resume_state_path:
            self.state = ckpt.restore_training_state(resume_state_path,
                                                     self.state)
        else:
            resumed = ckpt.auto_resume(paths.get("training_states", ""),
                                       self.state)
            if resumed is None:
                return 0
            self.state = resumed
        return int(jax.device_get(self.state.step))

    def load_network(self, path: str) -> None:
        params = ckpt.restore_network(path, self.state.params)
        self.state = self.state.replace(params=params)

    def get_current_log(self) -> Dict[str, float]:
        return dict(self.log_dict)

    def get_current_learning_rate(self, current_iter: Optional[int] = None):
        step = (current_iter if current_iter is not None
                else int(jax.device_get(self.state.step)))
        return [float(self.schedule(step))]


@MODEL_REGISTRY.register()
class ImageRestorationModel(_BaseWrapper):
    """The primary training wrapper (reference
    ``image_restoration_model.py:30-552``)."""

    def __init__(self, opt: Mapping[str, Any]):
        super().__init__(opt)
        train_opt = opt.get("train", {}) or {}
        net_opt = dict(opt["network_g"])
        if train_opt.get("enable_amp"):
            net_opt.setdefault("dtype", jnp.bfloat16)
        self.net_g = define_network(net_opt)

        self.cri_hybrid = build_hybrid_loss(train_opt)
        self.cri_pix = (build_loss(train_opt["pixel_opt"])
                        if train_opt.get("pixel_opt") else None)
        loss = self.cri_hybrid or HybridLossPlus(
            use_perc=False, use_deltaE=False, use_ssim=False, use_phys=False
        )

        optim_opt = dict(train_opt.get("optim_g",
                                       {"type": "AdamW", "lr": 1e-3}))
        base_lr = float(optim_opt.pop("lr", 1e-3))
        sched_opt = train_opt.get("scheduler")
        self.schedule = (
            make_schedule(sched_opt, base_lr,
                          warmup_iter=train_opt.get("warmup_iter", -1))
            if sched_opt else (lambda step: base_lr)
        )
        self.optimizer = make_optimizer(
            self.schedule,
            optim_type=optim_opt.pop("type", "AdamW"),
            betas=tuple(optim_opt.pop("betas", (0.9, 0.999))),
            weight_decay=float(optim_opt.pop("weight_decay", 0.01)),
            use_grad_clip=bool(train_opt.get("use_grad_clip", True)),
            accum_steps=int(train_opt.get("accum_steps", 1)),
        )
        seed = int(opt.get("manual_seed", 0))
        self.state = create_train_state(
            self.net_g, self.optimizer, jax.random.PRNGKey(seed),
            jnp.zeros((1, 64, 64, 3)), loss=loss,
        )
        self._train_step = make_train_step(self.net_g, loss, self.optimizer,
                                           pixel_loss=self.cri_pix,
                                           donate=False)
        self._eval_step = make_eval_step(self.net_g)
        self._grids_meta: Optional[dict] = None

    # -- reference surface ---------------------------------------------
    def feed_data(self, data: Mapping[str, Any], is_val: bool = False) -> None:
        batch = {}
        for key in ("lq", "gt", "short_raw", "long_raw", "short_obs",
                    "expo_ratio"):
            if key in data and data[key] is not None:
                batch[key] = jnp.asarray(np.asarray(data[key]))
        self.batch = batch

    def optimize_parameters(self, current_iter: int = 0,
                            tb_logger=None) -> None:
        self.state, logs = self._train_step(self.state, self.batch)
        self.log_dict = OrderedDict(
            (k, float(jax.device_get(v))) for k, v in logs.items()
        )

    def test(self, max_minibatch: Optional[int] = None) -> None:
        if self._grids_meta:  # reference: grids() then test() runs tiled
            return self.test_grids()
        lq = self.batch["lq"]
        m = max_minibatch or lq.shape[0]
        outs = [
            self._eval_step(self.state.params, lq[i : i + m])
            for i in range(0, lq.shape[0], m)
        ]
        self.output = jnp.concatenate(outs, axis=0)

    # tiled inference (reference grids/grids_inverse)
    def grids(self, crop_size: int = 256, overlap_ratio: float = 0.5) -> None:
        self._grids_meta = {"crop_size": crop_size,
                            "overlap_ratio": overlap_ratio}

    def grids_inverse(self) -> None:
        self._grids_meta = None

    def test_grids(self) -> None:
        if not self._grids_meta:
            return self.test()
        params = self.state.params

        def forward(x):
            return self._eval_step(params, x)

        self.output = tiled_inference(
            forward, self.batch["lq"],
            self._grids_meta["crop_size"],
            self._grids_meta["overlap_ratio"],
        )

    def get_current_visuals(self) -> Dict[str, np.ndarray]:
        out = {"lq": np.asarray(self.batch["lq"])}
        if self.output is not None:
            out["result"] = np.asarray(self.output)
        if "gt" in self.batch:
            out["gt"] = np.asarray(self.batch["gt"])
        return out

    def validation(self, dataloader, current_iter: int = 0, tb_logger=None,
                   save_img: bool = False, **kwargs) -> Dict[str, float]:
        """Validate over a loader; multi-host runs stride the batches by
        process index and allreduce the metric sums (reference
        ``dist_validation``, ``image_restoration_model.py:344-468``).
        ``save_img`` writes result PNGs under
        ``path.visualization/<name>/<name>_<iter>.png`` (reference
        ``:381-398``)."""
        from lowlight_image_enhancement_tpu.training.validation import (
            allreduce_metric_sums,
            save_result_image,
        )

        metrics_opt = (self.opt.get("val", {}) or {}).get("metrics", {}) or {}
        rank, world = jax.process_index(), jax.process_count()
        vis_dir = (self.opt.get("path", {}) or {}).get("visualization")
        sums: Dict[str, float] = {}
        n = 0
        for bidx, batch in enumerate(dataloader):
            if bidx % world != rank:
                continue
            self.feed_data(batch, is_val=True)
            if self._grids_meta:
                self.test_grids()
            else:
                self.test()
            if save_img:
                names = batch.get("pair_id")
                name = (str(names[0]) if names is not None
                        else f"img_{bidx:05d}")
                out_dir = os.path.join(vis_dir or "visualization", name)
                suffix = f"_{current_iter}" if self.opt.get("is_train") \
                    else ""
                save_result_image(
                    os.path.join(out_dir, f"{name}{suffix}.png"),
                    self.output[:1])
            per = compute_metrics(self.output, self.batch["gt"], metrics_opt)
            for k, v in per.items():
                sums[k] = sums.get(k, 0.0) + v
            n += 1
        sums, n = allreduce_metric_sums(sums, n)
        results = {k: v / n for k, v in sums.items()} if n else {}
        self.log_dict.update({f"m_{k}": v for k, v in results.items()})
        return results


@MODEL_REGISTRY.register()
class LowlightModel(_BaseWrapper):
    """Simpler wrapper (reference ``lowlight_model.py:25-166``): pixel loss
    (+ optional perceptual / ssim via ``build_loss``), plain AdamW/Adam/SGD
    training. ``feed_data`` accepts ``lq/gt`` or ``short/long``."""

    def __init__(self, opt: Mapping[str, Any]):
        super().__init__(opt)
        train_opt = opt.get("train", {}) or {}
        self.net_g = define_network(dict(opt["network_g"]))

        # reference builds each configured term and SUMS them, falling
        # back to plain L1 when none configured (lowlight_model.py:73-87,
        # 127-137)
        self.cri_pix = (build_loss(train_opt["pixel_opt"])
                        if train_opt.get("pixel_opt") else None)
        self.cri_perceptual = (build_loss(train_opt["perceptual_opt"])
                               if train_opt.get("perceptual_opt") else None)
        self.cri_ssim = (build_loss(train_opt["ssim_opt"])
                         if train_opt.get("ssim_opt") else None)
        if not any([self.cri_pix, self.cri_perceptual, self.cri_ssim]):
            logger.warning(
                "LowlightModel: no losses configured; falling back to L1.")
            self.cri_pix = build_loss({"type": "L1Loss"})

        optim_opt = dict(train_opt.get("optim_g",
                                       {"type": "AdamW", "lr": 1e-3}))
        base_lr = float(optim_opt.pop("lr", 1e-3))
        self.schedule = lambda step: base_lr
        self.optimizer = make_optimizer(
            base_lr,
            optim_type=optim_opt.pop("type", "AdamW"),
            betas=tuple(optim_opt.pop("betas", (0.9, 0.999))),
            weight_decay=float(optim_opt.pop("weight_decay", 0.0)),
            use_grad_clip=bool(train_opt.get("use_grad_clip", False)),
            grad_clip_norm=float(train_opt.get("grad_clip_norm", 1.0)),
            accum_steps=int(train_opt.get("accum_steps", 1)),
        )
        seed = int(opt.get("manual_seed", 0))
        self.state = create_train_state(
            self.net_g, self.optimizer, jax.random.PRNGKey(seed),
            jnp.zeros((1, 64, 64, _net_input_channels(opt["network_g"]))),
        )

        net = self.net_g
        cri_pix = self.cri_pix
        cri_perceptual = self.cri_perceptual
        cri_ssim = self.cri_ssim

        def loss_fn(trainable, batch):
            out = net.apply({"params": trainable["params"]}, batch["lq"],
                            deterministic=False)
            total = jnp.zeros(())
            logs = {}
            if cri_pix is not None:
                l_pix = cri_pix(out, batch["gt"])
                total = total + l_pix
                logs["l_pix"] = jax.lax.stop_gradient(l_pix)
            if cri_perceptual is not None:
                l_percep = cri_perceptual(out, batch["gt"])
                total = total + l_percep
                logs["l_percep"] = jax.lax.stop_gradient(l_percep)
            if cri_ssim is not None:
                l_ssim = cri_ssim(out, batch["gt"])
                total = total + l_ssim
                logs["l_ssim"] = jax.lax.stop_gradient(l_ssim)
            logs["l_total"] = jax.lax.stop_gradient(total)
            return total, logs

        import optax

        def step_fn(state, batch):
            trainable = {"params": state.params,
                         "log_sigma": state.log_sigma}
            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                trainable, batch)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, trainable)
            new = optax.apply_updates(trainable, updates)
            return state.replace(
                step=state.step + 1, params=new["params"],
                opt_state=opt_state, log_sigma=new["log_sigma"],
            ), logs

        self._train_step = jax.jit(step_fn)
        self._eval_step = make_eval_step(self.net_g)

    def feed_data(self, data: Mapping[str, Any], is_val: bool = False) -> None:
        lq = data.get("lq", data.get("short"))
        gt = data.get("gt", data.get("long"))
        batch = {"lq": jnp.asarray(np.asarray(lq))}
        if gt is not None:
            batch["gt"] = jnp.asarray(np.asarray(gt))
        self.batch = batch

    def optimize_parameters(self, current_iter: int = 0,
                            tb_logger=None) -> None:
        self.state, logs = self._train_step(self.state, self.batch)
        self.log_dict = OrderedDict(
            (k, float(jax.device_get(v))) for k, v in logs.items()
        )

    def test(self) -> None:
        self.output = self._eval_step(self.state.params, self.batch["lq"])
