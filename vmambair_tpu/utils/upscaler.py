"""RestorationUpscaler — production tiled-inference helper.

Rebuilds `RealESRGANer` (`/root/reference/SRGAN/VmambaIR/utils.py:14-300`):
pre_pad + mod-pad preprocessing, overlapping `tile_process` with `tile_pad`
halo and seam-free merge (`utils.py:97-170`), optional half precision, and
the alpha-channel path in `enhance()`.

TPU adaptations: tiles are STATIC shapes (one jit cache entry per tile
size), batched across the tile grid so the MXU sees large batched work, and
the halo merge happens on host numpy (cheap, out of the jit graph).
"""

from __future__ import annotations

import math
from typing import Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np


class RestorationUpscaler:
    def __init__(self, scale: int, model, params, tile: int = 0,
                 tile_pad: int = 10, pre_pad: int = 10,
                 half: bool = False, window: int = 8,
                 tile_batch: int = 4, mesh=None):
        """mesh: optional `jax.sharding.Mesh` with a 'data' axis — tiles are
        embarrassingly parallel, so the tile-batch axis is sharded across
        the mesh (params replicated) and each chip upscales its shard.
        `tile_batch` is rounded up to a mesh-size multiple."""
        self.scale = scale
        self.model = model
        self.params = params
        self.tile = tile
        self.tile_pad = tile_pad
        self.pre_pad = pre_pad
        self.window = window
        self.dtype = jnp.bfloat16 if half else jnp.float32
        self.mesh = mesh
        fn = lambda p, x: self.model.apply(  # noqa: E731
            p, x.astype(self.dtype)
        ).astype(jnp.float32)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            nd = mesh.devices.size
            tile_batch = max(1, -(-max(1, tile_batch) // nd) * nd)
            batch_sh = NamedSharding(mesh, P("data"))
            repl_sh = NamedSharding(mesh, P())
            self.params = jax.device_put(params, repl_sh)
            self._apply = jax.jit(
                fn,
                in_shardings=(
                    jax.tree_util.tree_map(lambda _: repl_sh, params),
                    batch_sh,
                ),
                out_shardings=batch_sh,
            )
        else:
            self._apply = jax.jit(fn)
        self.tile_batch = max(1, tile_batch)

    # -- whole-image path (`utils.py:52-96`) -------------------------------
    def pre_process(self, img: np.ndarray) -> tuple[np.ndarray, int, int]:
        """Reflect pre-pad + pad to the window multiple. Returns the padded
        array and the original h, w."""
        h, w = img.shape[:2]
        p = self.pre_pad
        if p:
            img = np.pad(img, ((p, p), (p, p), (0, 0)), mode="reflect")
        hp, wp = img.shape[:2]
        ph = (self.window - hp % self.window) % self.window
        pw = (self.window - wp % self.window) % self.window
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        return img, h, w

    def post_process(self, out: np.ndarray, h: int, w: int) -> np.ndarray:
        s, p = self.scale, self.pre_pad
        return out[p * s : p * s + h * s, p * s : p * s + w * s]

    # -- overlapped tiling (`utils.py:97-170`) ------------------------------
    def tile_process(self, img: np.ndarray) -> np.ndarray:
        """img: HWC float32. Overlapping tiles with halo, seam-free merge;
        tiles run in fixed-size batches so every jit call shares one cache
        entry."""
        h, w = img.shape[:2]
        s = self.scale
        tile = self.tile
        pad = self.tile_pad
        ny = math.ceil(h / tile)
        nx = math.ceil(w / tile)
        # reflect-pad so every (tile + 2*pad) patch is in range
        padded = np.pad(
            img,
            ((pad, pad + ny * tile - h), (pad, pad + nx * tile - w), (0, 0)),
            mode="reflect",
        )
        patch_size = tile + 2 * pad
        patches = []
        for iy in range(ny):
            for ix in range(nx):
                y0, x0 = iy * tile, ix * tile
                patches.append(
                    padded[y0 : y0 + patch_size, x0 : x0 + patch_size]
                )
        out = np.zeros((h * s, w * s, img.shape[2]), np.float32)
        tb = self.tile_batch
        n = len(patches)
        pad_n = (tb - n % tb) % tb
        patches += [patches[-1]] * pad_n
        results = []
        for i in range(0, len(patches), tb):
            batch = jnp.asarray(np.stack(patches[i : i + tb]))
            results.append(np.asarray(self._apply(self.params, batch)))
        results = np.concatenate(results, axis=0)[:n]
        for idx in range(n):
            iy, ix = divmod(idx, nx)
            res = results[idx][pad * s : (pad + tile) * s,
                               pad * s : (pad + tile) * s]
            y0, x0 = iy * tile * s, ix * tile * s
            hh = min(tile * s, h * s - y0)
            ww = min(tile * s, w * s - x0)
            out[y0 : y0 + hh, x0 : x0 + ww] = res[:hh, :ww]
        return out

    # -- public API (`utils.py:180-...` enhance) ----------------------------
    def enhance(self, img: np.ndarray, outscale: Optional[float] = None
                ) -> tuple[np.ndarray, str]:
        """img: HWC BGR uint8/uint16 (or HW gray / HWCA with alpha).
        Returns (output BGR uint8/16, img_mode)."""
        h_input, w_input = img.shape[:2]
        max_range = 65535.0 if img.dtype == np.uint16 else 255.0
        imgf = img.astype(np.float32) / max_range
        if imgf.ndim == 2:
            img_mode = "L"
            imgf = cv2.cvtColor(imgf, cv2.COLOR_GRAY2RGB)
            alpha = None
        elif imgf.shape[2] == 4:
            img_mode = "RGBA"
            alpha = imgf[:, :, 3]
            imgf = cv2.cvtColor(imgf[:, :, :3], cv2.COLOR_BGR2RGB)
        else:
            img_mode = "RGB"
            alpha = None
            imgf = cv2.cvtColor(imgf, cv2.COLOR_BGR2RGB)

        out = self._run(imgf)
        if alpha is not None:
            # upscale alpha through the model too (reference
            # `alpha_upsampler='realesrgan'` path)
            alpha3 = cv2.cvtColor(alpha, cv2.COLOR_GRAY2RGB)
            out_alpha = self._run(alpha3)[:, :, 0]

        out = cv2.cvtColor(out, cv2.COLOR_RGB2BGR)
        if alpha is not None:
            out = np.dstack([out, out_alpha])
        if img_mode == "L":
            out = cv2.cvtColor(out, cv2.COLOR_BGR2GRAY)

        if outscale is not None and outscale != self.scale:
            out = cv2.resize(
                out,
                (int(w_input * outscale), int(h_input * outscale)),
                interpolation=cv2.INTER_LANCZOS4,
            )
        if max_range == 65535.0:
            return (np.clip(out, 0, 1) * 65535.0).round().astype(
                np.uint16), img_mode
        return (np.clip(out, 0, 1) * 255.0).round().astype(
            np.uint8), img_mode

    def _run(self, img: np.ndarray) -> np.ndarray:
        if self.tile:
            return self.tile_process(img)
        padded, h, w = self.pre_process(img)
        out = np.asarray(self._apply(self.params, padded[None])[0])
        return self.post_process(out, h, w)
