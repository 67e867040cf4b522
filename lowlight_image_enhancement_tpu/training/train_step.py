"""Functional training core: TrainState + jitted train/eval steps.

TPU-native replacement for the reference's imperative
``ImageRestorationModel.optimize_parameters``
(``image_restoration_model.py:247-322``): one pure jitted function closed
over (net, loss, optimizer). Parity contracts preserved:

- batch wiring: ``Bhat_raw = net(lq)``, ``B_raw = long_raw (or gt)``,
  ``A_raw = short_raw (or lq)``, sRGB views are [0,1]-clamped copies,
  ``A_srgb01 = short_obs`` when present,
- gradient clipping to global-norm **0.01** (the reference's quirky but
  load-bearing value) via optax,
- mixed precision: bf16 activations via the net's ``dtype`` — no GradScaler
  (bf16 on TPU needs no loss scaling; documented AMP-semantics difference),
- the DDP "unused-param" trick (``+0.0*sum(p.sum())``) is unnecessary —
  unused params simply get zero gradients under jax.grad.

Data parallelism: pass a ``Mesh`` — the batch is sharded over ``data`` and
params replicated; XLA inserts the gradient all-reduce over ICI. Works
identically on 1 device.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from lowlight_image_enhancement_tpu.losses.hybrid import HybridLossPlus
from lowlight_image_enhancement_tpu.parallel.mesh import (
    replicate_sharding,
    shard_batch,
)

Array = jax.Array


@flax.struct.dataclass
class TrainState:
    """Replicated training state: params + optimizer state + step counter.

    ``log_sigma`` holds the optional Kendall-Gal uncertainty params (empty
    dict when unused) — trained jointly with the network, mirroring the
    reference's ``ParameterDict``.
    """

    step: Array
    params: Any
    opt_state: Any
    log_sigma: Dict[str, Array]


def create_train_state(
    net,
    optimizer: optax.GradientTransformation,
    rng: jax.Array,
    sample_input: Array,
    loss: Optional[HybridLossPlus] = None,
) -> TrainState:
    variables = net.init(rng, sample_input)
    params = variables["params"]
    log_sigma = (
        loss.init_uncertainty_params()
        if (loss is not None and loss.use_uncertainty)
        else {}
    )
    opt_state = optimizer.init({"params": params, "log_sigma": log_sigma})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=opt_state,
        log_sigma=log_sigma,
    )


def make_optimizer(
    learning_rate, optim_type: str = "AdamW",
    betas=(0.9, 0.999), weight_decay: float = 0.01,
    use_grad_clip: bool = True, grad_clip_norm: float = 0.01,
    accum_steps: int = 1,
) -> optax.GradientTransformation:
    """Reference optimizer recipe: AdamW(lr cosine, wd 0.01) + global-norm
    clip 0.01 (``image_restoration_model.py:112-142`` + clip at ``:305``).

    ``accum_steps > 1`` enables gradient accumulation (no reference
    counterpart — SURVEY §2.9 lists it absent there): every k-th
    ``update`` applies the mean of the last k micro-batch gradients and
    the first k-1 emit zero updates. Clipping and the LR schedule see
    only the applied (averaged) step, matching what a k×-larger batch
    would do. Lets memory-limited TPU configs (full-resolution crops,
    remat off) keep the reference's effective batch size."""
    if optim_type == "AdamW":
        tx = optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                         weight_decay=weight_decay)
    elif optim_type == "Adam":
        tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1])
    elif optim_type == "SGD":
        tx = optax.sgd(learning_rate)
    else:
        raise ValueError(f"unsupported optimizer {optim_type!r}")
    if use_grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
    if int(accum_steps) > 1:
        tx = optax.MultiSteps(
            tx, every_k_schedule=int(accum_steps)
        ).gradient_transformation()
    return tx


def hybrid_batch_kwargs(output: Array, batch: Mapping[str, Array]) -> Dict:
    """Map a batch dict onto HybridLossPlus kwargs (reference wiring,
    ``image_restoration_model.py:289-303``)."""
    gt = batch["gt"]
    long_raw = batch.get("long_raw", gt)
    short_raw = batch.get("short_raw", batch["lq"])
    short_obs = batch.get("short_obs")
    expo = batch.get("expo_ratio")
    if expo is None:
        expo = jnp.ones((output.shape[0],), dtype=output.dtype)
    expo = jnp.reshape(jnp.asarray(expo), (output.shape[0],))
    return dict(
        Bhat_raw=output,
        B_raw=long_raw,
        A_raw=short_raw,
        expo_ratio=expo,
        Bhat_srgb01=jnp.clip(output, 0.0, 1.0),
        B_srgb01=jnp.clip(gt, 0.0, 1.0),
        A_srgb01=(jnp.clip(short_obs, 0.0, 1.0)
                  if short_obs is not None else None),
    )


def make_train_step(
    net,
    loss: HybridLossPlus,
    optimizer: optax.GradientTransformation,
    pixel_loss: Optional[Callable] = None,
    donate: bool = True,
    mixup_alpha: Optional[float] = None,
    seed: int = 0,
    state_shardings=None,
) -> Callable[[TrainState, Mapping[str, Array]], Tuple[TrainState, Dict]]:
    """Build the jitted train step.

    Returns ``train_step(state, batch) -> (new_state, logs)``. ``batch`` is
    a dict with at least ``lq`` and ``gt`` (NHWC); optional keys
    ``short_raw/long_raw/short_obs/expo_ratio`` refine the physics wiring.
    ``mixup_alpha`` enables batch mixup (reference ``train.mixup``) with a
    per-step key derived from ``seed`` and the step counter.
    ``state_shardings`` (a ``TrainState``-shaped pytree of
    ``NamedSharding``; see ``parallel.zero.zero1_device_put``) pins the
    output state's placement so e.g. ZeRO-1 optimizer-state partitioning
    persists across steps.
    """

    def loss_fn(trainable, batch):
        output = net.apply({"params": trainable["params"]}, batch["lq"],
                           deterministic=False)
        total = jnp.zeros(())
        logs: Dict[str, Array] = {}
        if pixel_loss is not None:
            l_pix = pixel_loss(output, batch["gt"])
            total = total + l_pix
            logs["l_pix"] = jax.lax.stop_gradient(l_pix)
        h_total, h_logs = loss(
            **hybrid_batch_kwargs(output, batch),
            log_sigma=trainable["log_sigma"] or None,
        )
        total = total + h_total
        logs.update(h_logs)
        logs["l_total"] = jax.lax.stop_gradient(total)
        return total, logs

    def train_step(state: TrainState, batch: Mapping[str, Array]):
        if mixup_alpha:
            from lowlight_image_enhancement_tpu.training.augment import (
                mixup_batch,
            )

            rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
            batch = mixup_batch(rng, batch, alpha=mixup_alpha)
        trainable = {"params": state.params, "log_sigma": state.log_sigma}
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, batch
        )
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        logs["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_trainable["params"],
            opt_state=opt_state,
            log_sigma=new_trainable["log_sigma"],
        )
        return new_state, logs

    return jax.jit(
        train_step,
        donate_argnums=(0,) if donate else (),
        out_shardings=(
            (state_shardings, None) if state_shardings is not None else None
        ),
    )


def make_eval_step(net) -> Callable:
    """Jitted no-grad forward (reference ``test()``)."""

    def eval_step(params, lq):
        return net.apply({"params": params}, lq, deterministic=True)

    return jax.jit(eval_step)


def put_replicated(state: TrainState, mesh) -> TrainState:
    """Replicate the train state across a mesh."""
    rep = replicate_sharding(mesh)
    return jax.device_put(state, rep)
