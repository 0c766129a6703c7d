"""GAN losses (vanilla/lsgan/wgan/hinge).

Functional rebuild of pip-basicsr's `GANLoss` as used by the reference GAN
stages (`SRGAN/VmambaIR/models/MambaSISRGAN_model.py:130-171`, YAML
`gan_opt.gan_type: vanilla`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..utils.registry import LOSS_REGISTRY


@LOSS_REGISTRY.register(name="GANLoss")
class GANLoss:
    def __init__(self, gan_type="vanilla", real_label_val=1.0,
                 fake_label_val=0.0, loss_weight=1.0):
        self.gan_type = gan_type
        self.real_label_val = real_label_val
        self.fake_label_val = fake_label_val
        self.loss_weight = loss_weight

    def __call__(self, pred, target_is_real: bool, is_disc: bool = False):
        if self.gan_type == "vanilla":
            label = self.real_label_val if target_is_real else self.fake_label_val
            loss = jnp.mean(
                optax.sigmoid_binary_cross_entropy(
                    pred, jnp.full_like(pred, label)
                )
            )
        elif self.gan_type == "lsgan":
            label = self.real_label_val if target_is_real else self.fake_label_val
            loss = jnp.mean(jnp.square(pred - label))
        elif self.gan_type == "wgan":
            loss = -jnp.mean(pred) if target_is_real else jnp.mean(pred)
        elif self.gan_type == "wgan_softplus":
            loss = (
                jnp.mean(jax.nn.softplus(-pred))
                if target_is_real
                else jnp.mean(jax.nn.softplus(pred))
            )
        elif self.gan_type == "hinge":
            if is_disc:
                p = -pred if target_is_real else pred
                loss = jnp.mean(jax.nn.relu(1.0 + p))
            else:
                loss = -jnp.mean(pred)
        else:
            raise NotImplementedError(self.gan_type)
        # generator loss keeps loss_weight; discriminator does not (basicsr
        # semantics)
        return loss if is_disc else self.loss_weight * loss
