"""RealSR models — on-device two-order degradation synthesis + GAN.

Rebuilds `MambaRealSR` / `MambaRealSRGAN`
(`/root/reference/RealSR/VmambaIR/models/MambaRealSR_model.py:44-333`,
`MambaRealSRGAN_model.py:17-364`): `feed_data` receives clean GT crops plus
per-sample blur kernels from the dataset and synthesizes the LQ input on
device under no-grad —

  order 1: blur(kernel1) -> random resize (up/down/keep, 0.15-1.5) ->
           gaussian|poisson noise -> JPEG;
  order 2 (probabilistic blur): blur(kernel2) -> resize -> noise ->
           {JPEG -> sinc} or {sinc -> JPEG} (random order) -> clamp/round;
  then resize to (H/scale, W/scale), paired random crop to gt_size, and a
  size-`queue_size` training-pair shuffle queue
  (`MambaRealSRGAN_model.py:88-123`).

TPU mapping: the whole synthesis graph is ONE jitted program on traced
PRNG draws (`lax.switch`/`lax.cond` for the discrete choices, static-canvas
`scale_and_translate` for the continuous resize factors), fused by XLA and
running on the same chips as the train step; the shuffle queue is a device-
resident circular buffer.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.degradation import (
    add_gaussian_noise,
    add_poisson_noise,
    filter2d,
    jpeg_compress_padded,
    random_resize,
    random_resize_back,
    resize_to,
    usm_sharp,
)
from ..utils.registry import MODEL_REGISTRY
from .gan_model import SRGANModel
from .sr_model import SRModel

logger = logging.getLogger("vmambair_tpu")


def _draw_scale(key, updown_prob, rrange):
    """Sample the resize factor: up in [1, hi], down in [lo, 1], or keep=1,
    with category probabilities `updown_prob` (`MambaRealSRGAN_model.py:
    137-146`)."""
    k1, k2 = jax.random.split(key)
    cat = jax.random.choice(k1, 3, p=jnp.asarray(updown_prob))
    u = jax.random.uniform(k2)
    lo, hi = rrange
    return jax.lax.switch(
        cat,
        [
            lambda: 1.0 + u * (hi - 1.0),  # up
            lambda: lo + u * (1.0 - lo),   # down
            lambda: 1.0,                   # keep
        ],
    )


def _noise_step(key, img, opt, prefix=""):
    """gaussian|poisson noise with YAML ranges
    (`MambaRealSRGAN_model.py:150-168`)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    b = img.shape[0]
    p_gauss = float(opt[f"gaussian_noise_prob{prefix}"])
    gray_prob = float(opt.get(f"gray_noise_prob{prefix}", 0.0))
    nr = opt[f"noise_range{prefix}"]
    pr = opt[f"poisson_scale_range{prefix}"]
    sigma = jax.random.uniform(k1, (b,), minval=nr[0], maxval=nr[1]) / 255.0
    pscale = jax.random.uniform(k2, (b,), minval=pr[0], maxval=pr[1])
    gray = jax.random.uniform(k3, (b,)) < gray_prob
    use_gauss = jax.random.uniform(k4) < p_gauss
    return jax.lax.cond(
        use_gauss,
        lambda im: add_gaussian_noise(k1, im, sigma, gray),
        lambda im: add_poisson_noise(k2, im, pscale, gray),
        img,
    )


def make_synthesis_fn(opt: Dict[str, Any], scale: int, gt_size: int,
                      differentiable: bool = False):
    """Build the jitted two-order degradation graph. Returns
    f(rng, gt, kernel1, kernel2, sinc_kernel) -> (gt_usm, gt_crop, lq)."""
    del differentiable  # synthesis is no-grad in the reference as well

    resize_prob = opt.get("resize_prob", [0.2, 0.7, 0.1])
    resize_range = opt.get("resize_range", [0.15, 1.5])
    resize_prob2 = opt.get("resize_prob2", [0.3, 0.4, 0.3])
    resize_range2 = opt.get("resize_range2", [0.3, 1.2])
    second_blur_prob = float(opt.get("second_blur_prob", 0.8))
    jpeg_range = opt.get("jpeg_range", [30, 95])
    jpeg_range2 = opt.get("jpeg_range2", [30, 95])

    def synth(rng, gt, kernel1, kernel2, sinc_kernel):
        b, h, w, c = gt.shape
        keys = jax.random.split(rng, 16)
        gt_usm = usm_sharp(gt)

        # ----- order 1 (`MambaRealSRGAN_model.py:131-172`)
        out = filter2d(gt_usm, kernel1)
        s1 = _draw_scale(keys[0], resize_prob, resize_range)
        m1 = jax.random.randint(keys[1], (), 0, 3)
        out = random_resize(out, s1, m1)
        out = _noise_step(keys[2], out, opt)
        q1 = jax.random.uniform(
            keys[3], (b,), minval=jpeg_range[0], maxval=jpeg_range[1]
        )
        out = jpeg_compress_padded(out, q1)

        # ----- order 2 (`MambaRealSRGAN_model.py:174-244`)
        do_blur2 = jax.random.uniform(keys[4]) < second_blur_prob
        out = jax.lax.cond(
            do_blur2, lambda x: filter2d(x, kernel2), lambda x: x, out
        )
        s2 = _draw_scale(keys[5], resize_prob2, resize_range2)
        m2 = jax.random.randint(keys[6], (), 0, 3)
        # resize relative to the *original* canvas: net factor s1*s2
        out = random_resize_back(out, s1, m2, (h, w))
        out = random_resize(out, s2, m2)
        out = _noise_step(keys[7], out, opt, prefix="2")

        lq_h, lq_w = h // scale, w // scale
        q2 = jax.random.uniform(
            keys[8], (b,), minval=jpeg_range2[0], maxval=jpeg_range2[1]
        )
        m3 = jax.random.randint(keys[9], (), 0, 3)

        def jpeg_then_sinc(x):
            x = random_resize_back(x, s2, m3, (lq_h, lq_w))
            x = filter2d(x, sinc_kernel)
            return jpeg_compress_padded(x, q2)

        def sinc_then_jpeg(x):
            x = jpeg_compress_padded(x, q2)
            x = random_resize_back(x, s2, m3, (lq_h, lq_w))
            return filter2d(x, sinc_kernel)

        order = jax.random.uniform(keys[10]) < 0.5
        lq = jax.lax.cond(order, jpeg_then_sinc, sinc_then_jpeg, out)
        # clamp/round to the uint8 grid (`MambaRealSRGAN_model.py:243`)
        lq = jnp.clip(jnp.round(lq * 255.0), 0.0, 255.0) / 255.0

        # paired random crop to gt_size (`:230-238`), traced offsets
        top = jax.random.randint(keys[11], (), 0, lq_h - gt_size // scale + 1)
        left = jax.random.randint(
            keys[12], (), 0, lq_w - gt_size // scale + 1
        )
        lq_c = jax.lax.dynamic_slice(
            lq, (0, top, left, 0),
            (b, gt_size // scale, gt_size // scale, c),
        )
        gt_c = jax.lax.dynamic_slice(
            gt, (0, top * scale, left * scale, 0), (b, gt_size, gt_size, c)
        )
        gt_usm_c = jax.lax.dynamic_slice(
            gt_usm, (0, top * scale, left * scale, 0),
            (b, gt_size, gt_size, c),
        )
        return gt_c, gt_usm_c, lq_c

    return jax.jit(synth)


class _DegradationMixin:
    """Shared feed_data: device-side synthesis + shuffle queue."""

    def _init_degradation(self):
        opt = self.opt
        self.gt_size = int(opt["datasets"]["train"].get("gt_size", 256)
                           if "datasets" in opt else opt.get("gt_size", 256))
        self.queue_size = int(opt.get("queue_size", 180))
        self._synth = make_synthesis_fn(opt, self.scale, self.gt_size)
        self._queue = None  # lazy: shapes known at first batch
        self._queue_ptr = 0
        self.l1_gt_usm = bool(opt.get("l1_gt_usm", True))
        self.percep_gt_usm = bool(opt.get("percep_gt_usm", True))
        self.gan_gt_usm = bool(opt.get("gan_gt_usm", False))
        self._enqueue_rng = np.random.RandomState(
            int(opt.get("manual_seed") or 0) + 77
        )

    def _dequeue_and_enqueue(self, lq, gt):
        """Training-pair pool (`MambaRealSRGAN_model.py:88-123`): FIFO fill,
        then shuffle + swap a batch per step to decorrelate synthesis params
        within a batch. Device-resident buffers."""
        if self.queue_size <= 0:
            return lq, gt
        b = lq.shape[0]
        if self._queue is None:
            qs = (self.queue_size // b) * b
            if qs == 0:
                return lq, gt
            self._queue = {
                "lq": jnp.zeros((qs,) + lq.shape[1:], lq.dtype),
                "gt": jnp.zeros((qs,) + gt.shape[1:], gt.dtype),
            }
            self._queue_len = qs
        if self._queue_ptr == self._queue_len:  # full: shuffle, swap batch
            perm = jnp.asarray(
                self._enqueue_rng.permutation(self._queue_len)
            )
            q_lq = self._queue["lq"][perm]
            q_gt = self._queue["gt"][perm]
            out_lq, out_gt = q_lq[:b], q_gt[:b]
            self._queue = {
                "lq": q_lq.at[:b].set(lq),
                "gt": q_gt.at[:b].set(gt),
            }
            return out_lq, out_gt
        self._queue = {
            "lq": jax.lax.dynamic_update_slice_in_dim(
                self._queue["lq"], lq, self._queue_ptr, 0
            ),
            "gt": jax.lax.dynamic_update_slice_in_dim(
                self._queue["gt"], gt, self._queue_ptr, 0
            ),
        }
        self._queue_ptr += b
        return lq, gt

    def put_batch(self, data: Dict[str, Any], keys=None) -> Dict[str, Any]:
        if keys is None:
            keys = (
                ("gt", "kernel1", "kernel2", "sinc_kernel")
                if self.is_train and "kernel1" in data else ("lq", "gt")
            )
        return SRModel.put_batch(self, data, keys)

    def feed_data(self, data: Dict[str, Any]):
        data = self.put_batch(data)
        if not self.is_train or "kernel1" not in data:
            # val/test path: plain paired data (`MambaRealSRGAN_model.py:
            # 246-258`)
            self.lq = data["lq"]
            self.gt = data.get("gt")
            self.gt_usm = self.gt
            return
        gt = data["gt"]
        kernel1 = data["kernel1"]
        kernel2 = data["kernel2"]
        sinc = data["sinc_kernel"]
        self.rng, k = jax.random.split(self.rng)
        gt_c, gt_usm_c, lq = self._synth(k, gt, kernel1, kernel2, sinc)
        lq, gt_pair = self._dequeue_and_enqueue(
            lq, jnp.concatenate([gt_c, gt_usm_c], axis=-1)
        )
        self.lq = lq
        self.gt = gt_pair[..., : gt_c.shape[-1]]
        self.gt_usm = gt_pair[..., gt_c.shape[-1]:]


@MODEL_REGISTRY.register(name="RealESRGANModel")
@MODEL_REGISTRY.register(name="MambaRealSRGAN")
@MODEL_REGISTRY.register(name="MambaRealSRGANtest")
class RealESRGANModel(_DegradationMixin, SRGANModel):
    """GAN stage with per-loss USM-GT selection
    (`MambaRealSRGAN_model.py:289-302`). `MambaRealSRGANtest` differs only
    in tolerating GT-free inference (handled by feed_data here)."""

    def __init__(self, opt: Dict[str, Any]):
        super().__init__(opt)
        self._init_degradation()

    def _build_g_step(self):
        ema_decay = self.ema_decay
        base = super()._build_g_step  # noqa: F841 (overridden wholesale)

        def step(params, params_ema, opt_state, params_d, state_d,
                 lq, gt, gt_usm, lr):
            import optax

            def loss_fn(p):
                output = self.net_g.apply(p, lq)
                losses = {}
                total = 0.0
                if self.cri_pix is not None:
                    l_pix = self.cri_pix(
                        output, gt_usm if self.l1_gt_usm else gt
                    )
                    losses["l_g_pix"] = l_pix
                    total += l_pix
                if self.cri_perceptual is not None:
                    l_percep, l_style = self.cri_perceptual(
                        output, gt_usm if self.percep_gt_usm else gt
                    )
                    if l_percep is not None:
                        losses["l_g_percep"] = l_percep
                        total += l_percep
                    if l_style is not None:
                        losses["l_g_style"] = l_style
                        total += l_style
                fake_pred, _ = self._apply_d(
                    jax.lax.stop_gradient(params_d), state_d, output, False
                )
                l_g_gan = self.cri_gan(fake_pred, True, is_disc=False)
                losses["l_g_gan"] = l_g_gan
                total += l_g_gan
                return total, (losses, output)

            (_, (losses, output)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            from .base_model import ema_update, set_lr

            opt_state = set_lr(opt_state, lr)
            updates, opt_state = self.optimizer.update(
                grads, opt_state, params
            )
            params = optax.apply_updates(params, updates)
            if ema_decay > 0:
                params_ema = ema_update(params_ema, params, ema_decay)
            return params, params_ema, opt_state, losses, output

        return jax.jit(step, donate_argnums=(0, 1, 2))

    def optimize_parameters(self, current_iter: int):
        from collections import OrderedDict

        lr = self.schedule(current_iter)
        lr_d = self.schedule_d(current_iter)
        log = OrderedDict()
        do_g = (
            current_iter % self.net_d_iters == 0
            and current_iter > self.net_d_init_iters
        )
        if do_g:
            (self.params, self.params_ema, self.opt_state, losses,
             output) = self._g_step(
                self.params, self.params_ema, self.opt_state,
                self.params_d, self.state_d,
                self.lq, self.gt, self.gt_usm, jnp.float32(lr),
            )
            log.update(losses)  # device scalars; synced in get_current_log
        else:
            output = jax.jit(self.net_g.apply)(self.params, self.lq)
        gan_gt = self.gt_usm if self.gan_gt_usm else self.gt
        (self.params_d, self.state_d, self.opt_state_d,
         d_losses) = self._d_step(
            self.params_d, self.state_d, self.opt_state_d,
            output, gan_gt, jnp.float32(lr_d),
        )
        log.update(d_losses)
        log["lr"] = float(lr)
        self.log_dict = log


@MODEL_REGISTRY.register(name="RealESRNetModel")
@MODEL_REGISTRY.register(name="MambaRealSR")
class RealESRNetModel(_DegradationMixin, SRModel):
    """Stage-1 (L1-only) RealSR training with the same synthesis feed
    (`MambaRealSR_model.py:44-333`)."""

    def __init__(self, opt: Dict[str, Any]):
        super().__init__(opt)
        self._init_degradation()

    def optimize_parameters(self, current_iter: int):
        # L1 against the USM-sharpened GT (`MambaRealSR_model.py` S1 recipe)
        gt = self.gt
        if getattr(self, "gt_usm", None) is not None and self.l1_gt_usm:
            self.gt = self.gt_usm
        super().optimize_parameters(current_iter)
        self.gt = gt
