"""GAN + RealESRGAN trainer tests on tiny nets (CPU, 8 virtual devices) —
the reference's strategy of exercising multi-GPU code paths with `dist:
False` miniature configs (`RealSR/tests/test_model.py:12-120`)."""

import numpy as np
import pytest


def _gan_opt(tmp_path, model_type="SRGANModel"):
    return {
        "name": "t_gan", "model_type": model_type, "is_train": True,
        "scale": 4, "num_gpu": 2, "manual_seed": 0,
        "network_g": {"type": "OSSNet", "scale": 4, "dim": 8,
                      "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "scan_impl": "xla"},
        "network_d": {"type": "UNetDiscriminatorSN", "num_in_ch": 3,
                      "num_feat": 8},
        "path": {"models": str(tmp_path), "training_states": str(tmp_path)},
        "train": {
            "total_iter": 2, "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "optim_d": {"type": "Adam", "lr": 1e-4, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepLR", "milestones": [100],
                          "gamma": 0.5},
            "pixel_opt": {"type": "L1Loss", "loss_weight": 1.0},
            "gan_opt": {"type": "GANLoss", "gan_type": "vanilla",
                        "loss_weight": 0.1},
            "net_d_iters": 1, "net_d_init_iters": 0,
        },
        "val": {"window_size": 8},
    }


def test_gan_step_losses_and_save(tmp_path):
    from vmambair_tpu.train import build_model

    m = build_model(_gan_opt(tmp_path))
    rng = np.random.RandomState(0)
    batch = {
        "lq": rng.rand(2, 8, 8, 3).astype(np.float32),
        "gt": rng.rand(2, 32, 32, 3).astype(np.float32),
    }
    m.feed_data(batch)
    m.optimize_parameters(1)
    log = m.get_current_log()
    # reference loss-dict keys (`MambaSISRGAN_model.py:130-171`)
    for key in ("l_g_pix", "l_g_gan", "l_d_real", "l_d_fake",
                "out_d_real", "out_d_fake"):
        assert key in log, log.keys()
        assert np.isfinite(log[key])
    # net_d_init_iters gating: iter <= init -> no G losses
    m2 = build_model({**_gan_opt(tmp_path),
                      "train": {**_gan_opt(tmp_path)["train"],
                                "net_d_init_iters": 5}})
    m2.feed_data(batch)
    m2.optimize_parameters(1)
    assert "l_g_pix" not in m2.get_current_log()
    assert "l_d_real" in m2.get_current_log()

    m.save(epoch=0, current_iter=2)
    import os

    assert os.path.exists(os.path.join(str(tmp_path), "net_g_2.ckpt"))
    assert os.path.exists(os.path.join(str(tmp_path), "net_d_2.ckpt"))
    st = m.resume_training(os.path.join(str(tmp_path), "2.state"))
    assert st["iter"] == 2


def test_realesrgan_model_feed_and_step(tmp_path):
    """Full blind-SR path: dataset kernels -> on-device synthesis ->
    queue -> G/D steps (`MambaRealSRGAN_model.py:125-302`)."""
    from vmambair_tpu.train import build_model

    opt = _gan_opt(tmp_path, model_type="RealESRGANModel")
    opt.update(
        gt_size=32, queue_size=4,
        l1_gt_usm=True, percep_gt_usm=True, gan_gt_usm=False,
        resize_prob=[0.2, 0.7, 0.1], resize_range=[0.5, 1.2],
        gaussian_noise_prob=0.5, noise_range=[1, 10],
        poisson_scale_range=[0.05, 1], gray_noise_prob=0.4,
        jpeg_range=[60, 95],
        second_blur_prob=0.5, resize_prob2=[0.3, 0.4, 0.3],
        resize_range2=[0.6, 1.2], gaussian_noise_prob2=0.5,
        noise_range2=[1, 10], poisson_scale_range2=[0.05, 1],
        gray_noise_prob2=0.4, jpeg_range2=[60, 95],
    )
    m = build_model(opt)
    rng = np.random.RandomState(0)
    ident = np.zeros((2, 21, 21), np.float32)
    ident[:, 10, 10] = 1.0
    batch = {
        "gt": rng.rand(2, 64, 64, 3).astype(np.float32),
        "kernel1": ident, "kernel2": ident, "sinc_kernel": ident,
    }
    m.feed_data(batch)
    assert m.lq.shape == (2, 8, 8, 3)
    assert m.gt.shape == (2, 32, 32, 3)
    assert m.gt_usm.shape == (2, 32, 32, 3)
    m.optimize_parameters(1)
    log = m.get_current_log()
    assert "l_g_pix" in log and "l_d_real" in log
    # queue cycles once it fills (queue_size 4, batch 2)
    for it in range(2, 5):
        m.feed_data(batch)
        m.optimize_parameters(it)
    assert np.isfinite(list(m.get_current_log().values())).all()

    # eval path ignores synthesis (`MambaRealSRGAN_model.py:246-258`)
    m.is_train = False
    m.feed_data({"lq": rng.rand(1, 8, 8, 3).astype(np.float32)})
    assert m.lq.shape == (1, 8, 8, 3)


def test_progressive_schedule():
    from vmambair_tpu.train.pipeline import ProgressiveSchedule

    ps = ProgressiveSchedule(
        {"iters": [10, 10], "gt_sizes": [16, 32], "gt_size": 32,
         "mini_batch_sizes": [4, 2]},
        scale=1,
    )
    rng = np.random.RandomState(0)
    batch = {
        "lq": np.zeros((4, 32, 32, 3), np.float32),
        "gt": np.zeros((4, 32, 32, 3), np.float32),
    }
    b1 = ps.apply(dict(batch), 5, rng)
    assert b1["lq"].shape == (4, 16, 16, 3)
    b2 = ps.apply(dict(batch), 15, rng)
    assert b2["lq"].shape == (2, 32, 32, 3)


def test_mesh_sharded_feed():
    import jax

    from vmambair_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_batch,
    )

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    batch = {"lq": np.zeros((8, 4, 4, 3), np.float32)}
    out = shard_batch(batch, mesh)
    sh = out["lq"].sharding
    assert sh.is_equivalent_to(batch_sharding(mesh), 4)
