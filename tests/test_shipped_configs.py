"""Every shipped YAML recipe in options/ must parse, finalize, and build —
the configs ARE the compatibility surface with the reference's recipes
(`SRGAN/options/*.yml`, `RealSR/options/*.yml`,
`Deraining/Options/*.yml`), so drift between them and the registries is
a user-facing break even when unit tests stay green.

Network builds are trace-only (`jax.eval_shape`) — no compiles, so the
full-size dim-48 models are cheap to check.
"""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

OPT_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "options")
ALL_YMLS = sorted(glob.glob(os.path.join(OPT_DIR, "*.yml")))
TRAIN_YMLS = [p for p in ALL_YMLS
              if not os.path.basename(p).startswith("test_")]
TEST_YMLS = [p for p in ALL_YMLS if os.path.basename(p).startswith("test_")]


def _finalized(path, tmp_path, is_train):
    from vmambair_tpu.utils.options import finalize_options, ordered_yaml_load

    opt = ordered_yaml_load(path)
    opt["is_train"] = is_train
    if is_train:
        opt.setdefault("path", {})
        opt["path"]["experiments_root"] = str(tmp_path / "exp")
    return finalize_options(opt, str(tmp_path), is_train)


def _eval_shape_build(network_opt, scale):
    from vmambair_tpu.models import build_network

    net = build_network(dict(network_opt))
    size = 64
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    shapes = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), x))
    out = jax.eval_shape(
        lambda p: net.apply(p, x),
        shapes,
    )
    assert out.shape == (1, size * scale, size * scale, 3), out.shape
    return shapes


@pytest.mark.parametrize("path", ALL_YMLS, ids=os.path.basename)
def test_config_parses_and_generator_builds(path, tmp_path):
    is_train = not os.path.basename(path).startswith("test_")
    opt = _finalized(path, tmp_path, is_train)
    scale = opt.get("scale", 1)
    assert "network_g" in opt and "type" in opt["network_g"], path
    shapes = _eval_shape_build(opt["network_g"], scale)
    n_params = sum(
        int(jnp.prod(jnp.array(s.shape)))
        for s in jax.tree_util.tree_leaves(shapes)
    )
    assert n_params > 1e5, f"{path}: suspiciously tiny generator"


@pytest.mark.parametrize("path", TRAIN_YMLS, ids=os.path.basename)
def test_train_config_registries_resolve(path, tmp_path):
    """model_type, dataset types, discriminator, losses, and scheduler in
    every shipped train recipe must resolve against the live registries —
    the exact failure a reference user migrating a recipe would hit."""
    from vmambair_tpu.losses import LOSS_REGISTRY
    from vmambair_tpu.utils.registry import (
        ARCH_REGISTRY,
        DATASET_REGISTRY,
        MODEL_REGISTRY,
    )
    import vmambair_tpu.data  # noqa: F401  (registers datasets)
    import vmambair_tpu.models  # noqa: F401
    import vmambair_tpu.train  # noqa: F401

    opt = _finalized(path, tmp_path, True)
    assert MODEL_REGISTRY.get(opt["model_type"]) is not None
    for phase, ds in (opt.get("datasets") or {}).items():
        assert DATASET_REGISTRY.get(ds["type"]) is not None, (path, phase)
    if "network_d" in opt:
        assert ARCH_REGISTRY.get(opt["network_d"]["type"]) is not None
    train = opt["train"]
    for key in ("pixel_opt", "perceptual_opt", "gan_opt"):
        if key in train and train[key]:
            assert LOSS_REGISTRY.get(train[key]["type"]) is not None, key
    from vmambair_tpu.train.schedulers import build_scheduler

    sched = build_scheduler(train["scheduler"], base_lr=1e-4,
                            total_iter=int(train["total_iter"]))
    assert float(sched(0)) > 0.0
