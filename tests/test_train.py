"""Trainer-layer tests: schedulers, checkpoint roundtrip, loader/sampler,
packfile backend, train-step integration on a tiny model (CPU, 8 virtual
devices — mirrors the reference's `dist: False` tiny-net strategy,
`RealSR/tests/test_model.py`)."""

import os
import tempfile

import numpy as np
import pytest

from vmambair_tpu.train.schedulers import (
    build_scheduler,
    cosine_annealing_restart_cyclic_lr,
    multi_step_restart_lr,
    multi_step_lr,
    with_warmup,
)


def test_multistep_lr():
    lr = multi_step_lr(2e-4, [50_000, 70_000], 0.5)
    assert lr(0) == 2e-4
    assert lr(50_000) == 1e-4
    assert lr(70_000) == 5e-5
    assert lr(99_999) == 5e-5


def test_cosine_restart_cyclic():
    # deraining recipe (`Deraining_mamber33.yml:81-85`)
    lr = cosine_annealing_restart_cyclic_lr(
        3e-4, [144_000, 288_000], (1, 1), (3e-4, 1e-6)
    )
    assert lr(0) == pytest.approx(3e-4)
    # first cycle floor is eta_mins[0]=3e-4 -> constant
    assert lr(100_000) == pytest.approx(3e-4)
    # second cycle anneals to 1e-6
    assert lr(144_001) == pytest.approx(3e-4, rel=1e-3)
    assert lr(432_000) == pytest.approx(1e-6, rel=1e-2)


def test_warmup():
    lr = with_warmup(lambda s: 1e-3, warmup_iter=100)
    assert lr(0) == 0.0
    assert lr(50) == pytest.approx(5e-4)
    assert lr(100) == 1e-3


def test_build_scheduler_from_yaml_block():
    lr = build_scheduler(
        {"type": "CosineAnnealingRestartCyclicLR",
         "periods": [10, 20], "restart_weights": [1, 1],
         "eta_mins": [1e-3, 1e-6]},
        base_lr=1e-3, total_iter=30,
    )
    assert lr(0) > 0


def test_enlarged_sampler_sharding():
    from vmambair_tpu.data.loader import EnlargedSampler

    n, replicas, ratio = 10, 4, 3
    all_idx = []
    for rank in range(replicas):
        s = EnlargedSampler(n, replicas, rank, ratio)
        s.set_epoch(1)
        idx = list(s)
        assert len(idx) == s.num_samples
        all_idx.extend(idx)
    # every rank sees the same count; all indices valid
    assert len(all_idx) == -(-n * ratio // replicas) * replicas
    assert all(0 <= i < n for i in all_idx)


def test_tiny_dataset_still_fills_one_global_batch():
    # dataset smaller than the global batch: the sampler pads the virtual
    # epoch to a multiple of the device count (reference EnlargedSampler
    # pads to world_size, `data_sampler.py:31-33`) so the train loader
    # yields at least one full batch instead of StopIteration
    from vmambair_tpu.data import build_dataloader

    class DS:
        def __len__(self):
            return 6

        def __getitem__(self, i, rng=None):
            return {"x": np.full((2,), i, np.float32)}

    opt = {"phase": "train", "batch_size_per_gpu": 1, "num_gpu": 8,
           "num_worker_per_gpu": 1, "dataset_enlarge_ratio": 1}
    loader, sampler = build_dataloader(DS(), opt)
    assert sampler.total_size == 8
    assert len(loader) == 1
    batches = list(loader)
    assert len(batches) == 1 and batches[0]["x"].shape == (8, 2)
    assert all(0 <= int(v[0]) < 6 for v in batches[0]["x"])


def test_dataloader_order_and_epochs():
    from vmambair_tpu.data.loader import DataLoader

    class DS:
        def __len__(self):
            return 7

        def __getitem__(self, i, rng=None):
            return {"x": np.full((2, 2), i, np.float32)}

    dl = DataLoader(DS(), batch_size=2, num_workers=3, drop_last=True,
                    shuffle=False)
    batches = list(dl)
    assert len(batches) == 3
    assert batches[0]["x"].shape == (2, 2, 2)
    # order preserved without shuffle
    assert batches[0]["x"][0, 0, 0] == 0 and batches[1]["x"][0, 0, 0] == 2


def test_packfile_roundtrip(tmp_path):
    from vmambair_tpu.data.packfile import PackReader, write_packfile

    p = str(tmp_path / "t.vmpack")
    write_packfile(p, [(f"k{i:03d}", bytes([i]) * (i + 1))
                       for i in range(50)])
    r = PackReader(p)
    assert len(r) == 50
    assert r.get("k007") == bytes([7]) * 8
    with pytest.raises(KeyError):
        r.get("nope")
    assert r.keys()[0] == "k000"
    r.close()


def test_file_client_pack_backend(tmp_path):
    from vmambair_tpu.data.file_client import FileClient
    from vmambair_tpu.data.packfile import write_packfile

    p = str(tmp_path / "gt.vmpack")
    write_packfile(p, [("a", b"1"), ("b", b"22")])
    fc = FileClient("pack", db_paths=[p], client_keys=["gt"])
    assert fc.get("b", "gt") == b"22"


def test_checkpoint_network_roundtrip(tmp_path):
    import jax.numpy as jnp

    from vmambair_tpu.train.checkpoint import load_network, save_network

    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)},
              "b": jnp.ones((4,))}
    path = str(tmp_path / "net_g_1.ckpt")
    save_network(path, params, params_ema=params)
    zeros = {"a": {"w": jnp.zeros((2, 3))}, "b": jnp.zeros((4,))}
    out = load_network(path, zeros, "params_ema")
    assert np.allclose(out["a"]["w"], np.arange(6).reshape(2, 3))


def test_checkpoint_state_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import optax

    from vmambair_tpu.train.base_model import build_optimizer
    from vmambair_tpu.train.checkpoint import (
        load_training_state,
        save_training_state,
    )

    params = {"w": jnp.ones((3,))}
    opt = build_optimizer({"type": "Adam", "betas": [0.9, 0.99]})
    state = opt.init(params)
    path = str(tmp_path / "5.state")
    save_training_state(path, 5, 1, opt_state=state)
    fresh = opt.init({"w": jnp.zeros((3,))})
    out = load_training_state(path, {"opt_state": fresh})
    assert out["iter"] == 5 and out["epoch"] == 1
    leaves_a = jax.tree_util.tree_leaves(out["opt_state"])
    leaves_b = jax.tree_util.tree_leaves(state)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        assert np.allclose(a, b)


def test_sr_model_train_and_resume(tmp_path):
    """Two optimizer steps reduce the loss; save + resume restores state."""
    import jax

    from vmambair_tpu.train import build_model

    opt = {
        "name": "t", "model_type": "SRModel", "is_train": True,
        "scale": 1, "num_gpu": 2, "manual_seed": 0,
        "network_g": {"type": "OSSNet", "scale": 1,
                      "tail": "conv_residual", "dim": 8,
                      "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "scan_impl": "xla"},
        "path": {"models": str(tmp_path), "training_states": str(tmp_path)},
        "train": {
            "total_iter": 12, "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 3e-3, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepRestartLR", "milestones": [11],
                          "gamma": 0.1},
            "pixel_opt": {"type": "L1Loss"},
        },
        "val": {"window_size": 8},
    }
    m = build_model(opt)
    rng = np.random.RandomState(0)
    batch = {"lq": rng.rand(2, 16, 16, 3).astype(np.float32)}
    batch["gt"] = batch["lq"]  # identity task: loss must drop
    m.feed_data(batch)
    m.optimize_parameters(1)
    l1 = m.log_dict["l_pix"]
    for it in range(2, 13):
        m.feed_data(batch)
        m.optimize_parameters(it)
    assert m.log_dict["l_pix"] < l1
    assert m.log_dict["lr"] == pytest.approx(3e-4)  # milestone hit

    m.save(epoch=0, current_iter=4)
    assert os.path.exists(os.path.join(str(tmp_path), "net_g_4.ckpt"))

    m2 = build_model(opt)
    m2.load_net_g(os.path.join(str(tmp_path), "net_g_4.ckpt"))
    st = m2.resume_training(os.path.join(str(tmp_path), "4.state"))
    assert st["iter"] == 4
    # eval path: padded test on odd-size input
    m2.lq = np.asarray(rng.rand(1, 13, 17, 3), np.float32)
    import jax.numpy as jnp

    m2.lq = jnp.asarray(m2.lq)
    m2.test()
    assert m2.output.shape == (1, 13, 17, 3)


def test_mixup_wiring_and_training(tmp_path):
    """Deraining-style nested `mixing_augs.mixup` enables mixup in the
    train step (`image_restoration_model.py:22-49,86-91`)."""
    import numpy as np

    from vmambair_tpu.train import build_model

    opt = {
        "name": "t_mix", "model_type": "ImageCleanModel", "is_train": True,
        "scale": 1, "num_gpu": 2, "manual_seed": 0,
        "network_g": {"type": "OSSNet", "scale": 1,
                      "tail": "conv_residual", "dim": 8,
                      "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "scan_impl": "xla"},
        "path": {"models": str(tmp_path), "training_states": str(tmp_path)},
        "train": {
            "total_iter": 2, "ema_decay": 0.999,
            "mixing_augs": {"mixup": True, "mixup_beta": 1.2},
            "optim_g": {"type": "AdamW", "lr": 3e-4,
                        "weight_decay": 1e-4, "betas": [0.9, 0.999]},
            "scheduler": {"type": "CosineAnnealingRestartCyclicLR",
                          "periods": [10, 10], "restart_weights": [1, 1],
                          "eta_mins": [3e-4, 1e-6]},
            "use_grad_clip": True, "grad_clip": 0.01,
            "pixel_opt": {"type": "L1Loss"},
        },
        "val": {"window_size": 8},
    }
    m = build_model(opt)
    assert m.mixup is True
    rng = np.random.RandomState(0)
    batch = {"lq": rng.rand(2, 16, 16, 3).astype(np.float32),
             "gt": rng.rand(2, 16, 16, 3).astype(np.float32)}
    m.feed_data(batch)
    m.optimize_parameters(1)
    assert np.isfinite(m.log_dict["l_pix"])


def test_tiled_inference_matches_whole(tmp_path):
    """val.tile chop inference == whole-image forward for a conv-only net
    (seam-free merge; `MambaSISR2_model.py:99-195`)."""
    import jax.numpy as jnp
    import numpy as np

    from vmambair_tpu.train import build_model

    opt = {
        "name": "t_tile", "model_type": "SRModel", "is_train": False,
        "scale": 4, "num_gpu": 1, "manual_seed": 0,
        "network_g": {"type": "SRVGGNetCompact", "num_feat": 8,
                      "num_conv": 1, "upscale": 4},
        "path": {},
        "val": {"window_size": 1},
    }
    m = build_model(opt)
    rng = np.random.RandomState(0)
    m.lq = jnp.asarray(rng.rand(1, 24, 16, 3), jnp.float32)
    m.test()
    whole = np.asarray(m.output)
    m.opt["val"]["tile"] = 8
    m.opt["val"]["tile_pad"] = 4
    m.test()
    tiled = np.asarray(m.output)
    assert whole.shape == tiled.shape == (1, 96, 64, 3)
    # interior matches tightly; borders may differ by padding policy
    np.testing.assert_allclose(
        whole[:, 16:-16, 16:-16], tiled[:, 16:-16, 16:-16],
        rtol=1e-4, atol=1e-4,
    )


def _write_paired_fixtures(root, n=4, size=16):
    from vmambair_tpu.utils.img_util import imwrite

    rng = np.random.RandomState(3)
    gt_dir = os.path.join(root, "gt")
    lq_dir = os.path.join(root, "lq")
    for d in (gt_dir, lq_dir):
        os.makedirs(d, exist_ok=True)
    for i in range(n):
        img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
        imwrite(img, os.path.join(gt_dir, f"img{i}.png"))
        imwrite(img, os.path.join(lq_dir, f"img{i}.png"))
    return gt_dir, lq_dir


def _tiny_pipeline_opt(tmp_path, gt_dir, lq_dir, total_iter):
    exp = os.path.join(str(tmp_path), "exp")
    return {
        "name": "t_resume", "model_type": "SRModel", "is_train": True,
        "scale": 1, "num_gpu": 2, "manual_seed": 0, "auto_resume": True,
        "network_g": {"type": "OSSNet", "scale": 1,
                      "tail": "conv_residual", "dim": 8,
                      "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "scan_impl": "xla"},
        "datasets": {"train": {
            "name": "t", "type": "PairedImageDataset", "phase": "train",
            "scale": 1, "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
            "gt_size": 16, "use_hflip": False, "use_rot": False,
            "io_backend": {"type": "disk"}, "batch_size_per_gpu": 1,
            "num_worker_per_gpu": 1, "dataset_enlarge_ratio": 1,
        }},
        "path": {
            "experiments_root": exp,
            "models": os.path.join(exp, "models"),
            "training_states": os.path.join(exp, "training_states"),
            "log": exp,
            "visualization": os.path.join(exp, "visualization"),
        },
        "train": {
            "total_iter": total_iter, "ema_decay": 0.999,
            "optim_g": {"type": "Adam", "lr": 1e-3, "betas": [0.9, 0.99]},
            "scheduler": {"type": "MultiStepRestartLR",
                          "milestones": [1000], "gamma": 0.5},
            "pixel_opt": {"type": "L1Loss"},
        },
        "logger": {"print_freq": 1000, "save_checkpoint_freq": 1000},
        "val": {"window_size": 8},
    }


def test_pipeline_auto_resume_restores_generator(tmp_path):
    """End-to-end auto-resume: a resumed pipeline must rebuild the model FROM
    the saved net_g ckpt (check_resume before build_model, reference
    `train.py:150`), not from fresh random init — regression test for the
    round-1 bug where only opt_state/EMA were restored."""
    import jax

    from vmambair_tpu.train.checkpoint import load_network
    from vmambair_tpu.train.pipeline import train_pipeline

    gt_dir, lq_dir = _write_paired_fixtures(str(tmp_path))
    opt1 = _tiny_pipeline_opt(tmp_path, gt_dir, lq_dir, total_iter=2)
    m1 = train_pipeline(str(tmp_path), opt=dict(opt1))
    ckpt = os.path.join(opt1["path"]["models"], "net_g_2.ckpt")
    state = os.path.join(opt1["path"]["training_states"], "2.state")
    assert os.path.exists(ckpt) and os.path.exists(state)

    # resume with the same total_iter: zero extra steps, so the returned
    # model's params must EQUAL the checkpoint exactly
    opt2 = _tiny_pipeline_opt(tmp_path, gt_dir, lq_dir, total_iter=2)
    m2 = train_pipeline(str(tmp_path), opt=opt2)
    saved = load_network(ckpt, jax.tree_util.tree_map(np.asarray, m2.params))
    for a, b in zip(jax.tree_util.tree_leaves(m2.params),
                    jax.tree_util.tree_leaves(saved)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer state restored too (not fresh zeros)
    mu = jax.tree_util.tree_leaves(m2.opt_state)
    assert any(np.abs(np.asarray(l)).max() > 0 for l in mu)


def test_pipeline_profile_dir_hook(tmp_path):
    """`train: profile_dir:` wires jax.profiler into the loop (SURVEY §5
    tracing): the configured window produces a trace dump on disk."""
    from vmambair_tpu.train.pipeline import train_pipeline

    gt_dir, lq_dir = _write_paired_fixtures(str(tmp_path))
    opt = _tiny_pipeline_opt(tmp_path, gt_dir, lq_dir, total_iter=3)
    trace_dir = os.path.join(str(tmp_path), "trace")
    opt["train"]["profile_dir"] = trace_dir
    opt["train"]["profile_start"] = 2
    opt["train"]["profile_iters"] = 1
    train_pipeline(str(tmp_path), opt=opt)
    dumped = []
    for root, _dirs, files in os.walk(trace_dir):
        dumped += [f for f in files if "trace" in f or f.endswith(".pb")]
    assert dumped, f"no trace artifacts under {trace_dir}"


def test_train_loader_batch_scales_with_devices(tmp_path):
    """Global train batch = batch_size_per_gpu x resolved device count
    (reference recipe: 8/GPU x 8 DDP procs = 64, `MambaSISR15_x4.yml:30` +
    `train_S1.sh`) — `num_gpu: auto` must resolve to the mesh size."""
    import jax

    from vmambair_tpu.train.pipeline import create_train_val_dataloaders

    gt_dir, lq_dir = _write_paired_fixtures(str(tmp_path), n=8)
    opt = _tiny_pipeline_opt(tmp_path, gt_dir, lq_dir, total_iter=2)
    opt["num_gpu"] = "auto"
    opt["datasets"]["train"]["batch_size_per_gpu"] = 2
    opt["datasets"]["train"]["dataset_enlarge_ratio"] = 4
    train_loader, _ = create_train_val_dataloaders(opt)
    n_dev = len(jax.devices())
    assert n_dev == 8  # virtual CPU mesh from conftest
    assert train_loader.batch_size == 2 * n_dev
    batch = next(iter(train_loader))
    assert batch["lq"].shape[0] == 2 * n_dev


def test_pipeline_gan_end_to_end(tmp_path):
    """Pipeline-level GAN run (train.py path): SRGANModel through
    train_pipeline with a real dataset/loader — two optimizers step, both
    nets checkpoint, and the loss dict carries the reference's GAN keys
    (`MambaSISRGAN_model.py:130-171`). Model-level GAN steps are covered in
    test_gan_training.py; this closes the pipeline-integration gap."""
    from vmambair_tpu.train.pipeline import train_pipeline

    gt_dir, lq_dir = _write_paired_fixtures(str(tmp_path))
    opt = _tiny_pipeline_opt(tmp_path, gt_dir, lq_dir, total_iter=2)
    opt["name"] = "t_gan_pipe"
    opt["model_type"] = "SRGANModel"
    opt["network_d"] = {"type": "UNetDiscriminatorSN", "num_in_ch": 3,
                        "num_feat": 8}
    opt["train"]["optim_d"] = {"type": "Adam", "lr": 1e-4,
                               "betas": [0.9, 0.99]}
    opt["train"]["gan_opt"] = {"type": "GANLoss", "gan_type": "vanilla",
                               "loss_weight": 0.1}
    opt["train"]["net_d_iters"] = 1
    opt["train"]["net_d_init_iters"] = 0
    m = train_pipeline(str(tmp_path), opt=opt)
    log = m.get_current_log()
    for key in ("l_g_pix", "l_g_gan", "l_d_real", "l_d_fake"):
        assert key in log and np.isfinite(log[key]), (key, log)
    assert os.path.exists(os.path.join(opt["path"]["models"],
                                       "net_g_2.ckpt"))
    assert os.path.exists(os.path.join(opt["path"]["models"],
                                       "net_d_2.ckpt"))


def test_eval_pipeline_end_to_end(tmp_path):
    """test.py path (`test_pipeline`): load a trained ckpt via
    path.pretrain_network_g, run validation over a real PairedImageDataset
    loader, compute PSNR/SSIM, save result images — the reference's
    `test_mamba15_x4.yml` flow on tiny fixtures."""
    from vmambair_tpu.train.pipeline import test_pipeline, train_pipeline

    gt_dir, lq_dir = _write_paired_fixtures(str(tmp_path))
    topt = _tiny_pipeline_opt(tmp_path, gt_dir, lq_dir, total_iter=1)
    train_pipeline(str(tmp_path), opt=dict(topt))
    ckpt = os.path.join(topt["path"]["models"], "net_g_1.ckpt")
    assert os.path.exists(ckpt)

    results = os.path.join(str(tmp_path), "results")
    eopt = {
        "name": "t_eval", "model_type": "SRModel", "is_train": False,
        "scale": 1, "num_gpu": 1, "manual_seed": 0, "dist": False,
        "network_g": dict(topt["network_g"]),
        "datasets": {"test_1": {
            "name": "tiny", "type": "PairedImageDataset", "phase": "test",
            "scale": 1, "dataroot_gt": gt_dir, "dataroot_lq": lq_dir,
            "io_backend": {"type": "disk"},
        }},
        "path": {
            "pretrain_network_g": ckpt,
            "param_key_g": "params",
            "strict_load_g": True,
            "results_root": results,
            "log": results,
            "visualization": os.path.join(results, "visualization"),
        },
        "val": {
            "window_size": 8, "save_img": True,
            "metrics": {
                "psnr": {"type": "calculate_psnr", "crop_border": 0,
                         "test_y_channel": True},
                "ssim": {"type": "calculate_ssim", "crop_border": 0,
                         "test_y_channel": True},
            },
        },
    }
    test_pipeline(str(tmp_path), opt=eopt)
    vis = os.path.join(results, "visualization", "tiny")
    saved = [f for f in os.listdir(vis) if f.endswith(".png")]
    assert len(saved) == 4, saved


@pytest.mark.slow
def test_training_improves_psnr(tmp_path):
    """Convergence sanity beyond the 12-iter loss-drop check: 150 optimizer
    steps on a learnable constant-shift task must raise val PSNR by >3 dB
    over the untrained model (identity-residual tail makes the task
    solvable fast at tiny width)."""
    import jax.numpy as jnp

    from vmambair_tpu.metrics import calculate_psnr
    from vmambair_tpu.train import build_model

    opt = {
        "name": "t_conv", "model_type": "SRModel", "is_train": True,
        "scale": 1, "num_gpu": 2, "manual_seed": 0,
        "network_g": {"type": "OSSNet", "scale": 1,
                      "tail": "conv_residual", "dim": 8,
                      "num_blocks": [1, 1, 1, 1],
                      "num_refinement_blocks": 1, "scan_impl": "xla"},
        "path": {"models": str(tmp_path), "training_states": str(tmp_path)},
        "train": {
            "total_iter": 150, "ema_decay": 0.99,
            "optim_g": {"type": "Adam", "lr": 2e-3, "betas": [0.9, 0.99]},
            "scheduler": {"type": "ConstantLR"},
            "pixel_opt": {"type": "L1Loss"},
        },
        "val": {"window_size": 8},
    }
    m = build_model(opt)
    rng = np.random.RandomState(1)
    # learnable mapping: gt = 0.8*lq + 0.1 (a constant affine shift)
    lqs = rng.rand(6, 2, 16, 16, 3).astype(np.float32)

    def psnr_on_val(model):
        lq = jnp.asarray(lqs[-1])
        model.lq = lq
        model.test()
        out = np.clip(np.asarray(model.output), 0, 1)
        gt = np.clip(0.8 * lqs[-1] + 0.1, 0, 1)
        return np.mean([
            calculate_psnr(out[i] * 255.0, gt[i] * 255.0, crop_border=0)
            for i in range(out.shape[0])
        ])

    psnr0 = psnr_on_val(m)
    for it in range(1, 151):
        lq = lqs[it % 5]
        m.feed_data({"lq": lq,
                     "gt": (0.8 * lq + 0.1).astype(np.float32)})
        m.optimize_parameters(it)
    psnr1 = psnr_on_val(m)
    assert psnr1 > psnr0 + 3.0, (psnr0, psnr1)


def test_device_prefetcher_semantics():
    """DevicePrefetcher (the CUDAPrefetcher analog): one batch is always
    preloaded ahead through put(); the progressive transform sees the
    1-based sequence number the batch will be consumed at, so stage
    boundaries land on the exact iteration."""
    from vmambair_tpu.data import DevicePrefetcher

    class FakeHost:
        def __init__(self):
            self.produced = 0
            self.epoch = 0

        def next(self):
            self.produced += 1
            return {"i": self.produced}

    host = FakeHost()
    dp = DevicePrefetcher(
        host,
        put=lambda b: {**b, "put": True},
        transform=lambda b, seq: {**b, "seq": seq},
    )
    assert host.produced == 1  # constructor preloads one batch
    b1 = dp.next()
    assert b1 == {"i": 1, "seq": 1, "put": True}
    assert host.produced == 2  # next batch already requested
    b2 = dp.next()
    assert b2 == {"i": 2, "seq": 2, "put": True}
    assert dp.epoch == 0


def test_feed_data_accepts_prefetched_device_batch(tmp_path):
    """feed_data(put_batch(x)) == feed_data(x): an already-transferred
    batch passes through put_batch unchanged (what the device-prefetch
    path feeds the model)."""
    import jax.numpy as jnp
    import numpy as np

    from vmambair_tpu.train import build_model

    opt = {
        "name": "t_dp", "model_type": "SRModel", "is_train": False,
        "scale": 1, "num_gpu": 1, "manual_seed": 0,
        "network_g": {"type": "SRVGGNetCompact", "num_feat": 4,
                      "num_conv": 1, "upscale": 1},
        "path": {}, "val": {"window_size": 1},
    }
    m = build_model(opt)
    rng = np.random.RandomState(0)
    batch = {"lq": rng.rand(2, 8, 8, 3).astype(np.float32)}
    dev_batch = m.put_batch(batch)
    assert isinstance(dev_batch["lq"], jnp.ndarray)
    m.feed_data(dev_batch)
    a = np.asarray(m.lq)
    m.feed_data(batch)
    np.testing.assert_array_equal(a, np.asarray(m.lq))
