"""SRGANModel — adversarial fine-tuning stage (S2).

Rebuilds pip-basicsr `SRGANModel` + the reference subclass
(`/root/reference/SRGAN/VmambaIR/models/MambaSISRGAN_model.py:19-176`):
generator step gated by `net_d_iters`/`net_d_init_iters`, losses =
pixel + VGG19 perceptual + vanilla GAN, then discriminator real/fake steps,
EMA after. The UNet-SN discriminator carries spectral-norm power-iteration
state (`batch_stats` collection) threaded through the D step.

TPU mapping: the G-step and D-step are two separate jitted programs; the
host picks which to run from the (python-int) iteration — the same control
flow as the reference's `if current_iter % net_d_iters == 0` without traced
branching.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from ..losses import build_loss
from ..models import build_network
from ..parallel.mesh import replicated
from ..utils.registry import MODEL_REGISTRY
from .base_model import build_optimizer, ema_update, set_lr
from .checkpoint import (
    load_network,
    load_training_state,
    save_network,
    save_training_state,
)
from .sr_model import SRModel

logger = logging.getLogger("vmambair_tpu")


@MODEL_REGISTRY.register(name="SRGANModel")
@MODEL_REGISTRY.register(name="MambaSISRGANModel")
class SRGANModel(SRModel):
    def __init__(self, opt: Dict[str, Any]):
        # nets/optimizers for D are created inside init_training_settings,
        # which SRModel.__init__ invokes when is_train
        super().__init__(opt)
        if not self.is_train and opt.get("network_d"):
            self._init_net_d()

    def _init_net_d(self):
        self.net_d = build_network(self.opt["network_d"])
        dummy = jnp.zeros((1, 32, 32, self.opt["network_d"].get(
            "num_in_ch", 3)), jnp.float32)
        self.rng, k = jax.random.split(self.rng)
        variables = jax.jit(self.net_d.init)(k, dummy)
        variables = jax.device_put(variables, replicated(self.mesh))
        self.params_d = variables["params"]
        self.state_d = {
            k: v for k, v in variables.items() if k != "params"
        }

    def init_training_settings(self):
        train_opt = self.opt["train"]
        self.ema_decay = float(train_opt.get("ema_decay", 0))
        if self.ema_decay > 0:
            self.params_ema = jax.tree_util.tree_map(jnp.copy, self.params)
        self.mixup = bool(train_opt.get("mixup", False))

        self._init_net_d()

        self.cri_pix = (
            build_loss(dict(train_opt["pixel_opt"]))
            if train_opt.get("pixel_opt") else None
        )
        self.cri_perceptual = (
            build_loss(dict(train_opt["perceptual_opt"]))
            if train_opt.get("perceptual_opt") else None
        )
        self.cri_gan = build_loss(dict(train_opt["gan_opt"]))
        self.net_d_iters = int(train_opt.get("net_d_iters", 1))
        self.net_d_init_iters = int(train_opt.get("net_d_init_iters", 0))

        self.optimizer = build_optimizer(dict(train_opt["optim_g"]))
        self.opt_state = jax.jit(self.optimizer.init)(self.params)
        self.optimizer_d = build_optimizer(dict(train_opt["optim_d"]))
        self.opt_state_d = jax.jit(self.optimizer_d.init)(self.params_d)
        for t in ("opt_state", "opt_state_d"):
            setattr(self, t, jax.device_put(
                getattr(self, t), replicated(self.mesh)))

        self.schedule = self._make_schedule(train_opt, "optim_g")
        self.schedule_d = self._make_schedule(train_opt, "optim_d")
        self._g_step = self._build_g_step()
        self._d_step = self._build_d_step()

    # ------------------------------------------------------------------
    def _apply_d(self, params_d, state_d, x, train: bool):
        variables = {"params": params_d, **state_d}
        if train and state_d:
            out, new_state = self.net_d.apply(
                variables, x, update_stats=True,
                mutable=list(state_d.keys()),
            )
            return out, new_state
        return self.net_d.apply(variables, x, update_stats=False), state_d

    def _build_g_step(self):
        ema_decay = self.ema_decay

        def step(params, params_ema, opt_state, params_d, state_d,
                 lq, gt, lr):
            def loss_fn(p):
                output = self.net_g.apply(p, lq)
                losses = {}
                total = 0.0
                if self.cri_pix is not None:
                    l_pix = self.cri_pix(output, gt)
                    losses["l_g_pix"] = l_pix
                    total += l_pix
                if self.cri_perceptual is not None:
                    l_percep, l_style = self.cri_perceptual(output, gt)
                    if l_percep is not None:
                        losses["l_g_percep"] = l_percep
                        total += l_percep
                    if l_style is not None:
                        losses["l_g_style"] = l_style
                        total += l_style
                # D's WEIGHTS are frozen for the G step
                # (`MambaSISRGAN_model.py:110-128`), but torch keeps net_d
                # in train() mode, so this forward still runs a
                # spectral-norm power iteration — update u here too
                # (iteration 1 of 3 per iter: G fake, D real, D fake),
                # matching the reference's u cadence.
                fake_pred, new_state = self._apply_d(
                    jax.lax.stop_gradient(params_d), state_d, output, True
                )
                l_g_gan = self.cri_gan(fake_pred, True, is_disc=False)
                losses["l_g_gan"] = l_g_gan
                total += l_g_gan
                return total, (losses, output, new_state)

            (_, (losses, output, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            opt_state = set_lr(opt_state, lr)
            updates, opt_state = self.optimizer.update(
                grads, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            if ema_decay > 0:
                params_ema = ema_update(params_ema, params, ema_decay)
            return params, params_ema, opt_state, losses, output, new_state

        return jax.jit(step, donate_argnums=(0, 1, 2))

    def _build_d_step(self):
        def step(params_d, state_d, opt_state_d, fake, gt, lr):
            fake = jax.lax.stop_gradient(fake)

            def loss_fn(pd):
                real_pred, new_state = self._apply_d(pd, state_d, gt, True)
                l_d_real = self.cri_gan(real_pred, True, is_disc=True)
                fake_pred, new_state = self._apply_d(
                    pd, new_state, fake, True
                )
                l_d_fake = self.cri_gan(fake_pred, False, is_disc=True)
                losses = {
                    "l_d_real": l_d_real,
                    "l_d_fake": l_d_fake,
                    "out_d_real": jnp.mean(real_pred),
                    "out_d_fake": jnp.mean(fake_pred),
                }
                return l_d_real + l_d_fake, (losses, new_state)

            (_, (losses, new_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params_d)
            opt_state_d = set_lr(opt_state_d, lr)
            updates, opt_state_d = self.optimizer_d.update(
                grads, opt_state_d, params_d
            )
            params_d = optax.apply_updates(params_d, updates)
            return params_d, new_state, opt_state_d, losses

        return jax.jit(step, donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------
    def optimize_parameters(self, current_iter: int):
        lr = self.schedule(current_iter)
        lr_d = self.schedule_d(current_iter)
        log = OrderedDict()

        do_g = (
            current_iter % self.net_d_iters == 0
            and current_iter > self.net_d_init_iters
        )
        if do_g:
            (self.params, self.params_ema, self.opt_state, losses,
             output, self.state_d) = self._g_step(
                self.params, self.params_ema, self.opt_state,
                self.params_d, self.state_d,
                self.lq, self.gt, jnp.float32(lr),
            )
            log.update(losses)  # device scalars; synced in get_current_log
        else:
            output = jax.jit(self.net_g.apply)(self.params, self.lq)

        (self.params_d, self.state_d, self.opt_state_d,
         d_losses) = self._d_step(
            self.params_d, self.state_d, self.opt_state_d,
            output, self.gt, jnp.float32(lr_d),
        )
        log.update(d_losses)
        log["lr"] = float(lr)
        self.log_dict = log

    def save(self, epoch: int, current_iter: int):
        super().save(epoch, current_iter)
        save_network(
            self._net_path("net_d", current_iter), self.params_d
        )
        if current_iter != -1:
            save_training_state(
                self._state_path(current_iter),
                current_iter,
                epoch,
                opt_state=self.opt_state,
                params_ema=self.params_ema,
                opt_state_d=self.opt_state_d,
                params_d=self.params_d,
                state_d=self.state_d,
            )

    def resume_training(self, state_path: str) -> Dict[str, int]:
        targets = {
            "opt_state": self.opt_state,
            "opt_state_d": self.opt_state_d,
            "params_d": self.params_d,
            "state_d": self.state_d,
        }
        if self.params_ema is not None:
            targets["params_ema"] = self.params_ema
        st = load_training_state(state_path, targets)
        for k in ("opt_state", "opt_state_d", "params_d", "state_d",
                  "params_ema"):
            if k in st:
                setattr(self, k, jax.device_put(
                    st[k], replicated(self.mesh)))
        load_path = (self.opt.get("path") or {}).get("pretrain_network_d")
        if load_path:
            self.params_d = load_network(load_path, self.params_d)
        return {"iter": st["iter"], "epoch": st["epoch"]}
