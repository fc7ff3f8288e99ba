"""Image mode: fit a 2D coordinate network to an image (gigapixel demo).

Capability match for the reference's image testbed (src/testbed_image.cu):
a 2D hash-grid + MLP regressing uv -> rgb, trained on randomly sampled
coordinates with bilinearly interpolated targets
(testbed_image.cu:222-275), evaluated by `compute_image_mse`
(testbed_image.cu:455). This is the smallest end-to-end slice of the
framework: it exercises hash encoding fwd/bwd, the MLP, the optimizer
stack and the loss — all in one jitted train step.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import NGPNetworkConfig
from ..nn.hash_encoding import HashEncoding
from ..nn.mlp import MLP
from ..nn.losses import get_loss
from ..nn.optimizers import NGPOptimizer, NGPOptState


def bilinear_sample(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample (H, W, C) image at uv in [0,1]^2 (pixel centers at
    (i+0.5)/N), bilinear, clamped at borders."""
    h, w = img.shape[:2]
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[:, None]
    fy = (y - y0)[:, None]
    x0 = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


class ImageModel:
    """2D hash-grid encoder + MLP head."""

    def __init__(self, config: NGPNetworkConfig | None = None, n_channels: int = 3,
                 image_resolution: int = 1024):
        cfg = config or NGPNetworkConfig()
        if getattr(cfg, "encoding_raw", None):
            from ..nn.encodings import create_encoding

            self.encoding = create_encoding(
                cfg.encoding_raw, n_dims=2,
                desired_resolution=image_resolution)
        else:
            enc = cfg.encoding
            self.encoding = HashEncoding(
                n_levels=enc.n_levels,
                n_features_per_level=enc.n_features_per_level,
                log2_hashmap_size=enc.log2_hashmap_size,
                base_resolution=enc.base_resolution,
                # finest level resolves the image itself
                per_level_scale=enc.resolve_per_level_scale(
                    1, desired_resolution=image_resolution),
                n_dims=2,
            )
        self.mlp = MLP(
            n_input=self.encoding.n_output_dims,
            n_output=n_channels,
            n_neurons=cfg.network.n_neurons,
            n_hidden_layers=cfg.network.n_hidden_layers,
            activation=cfg.network.activation,
        )
        self.config = cfg

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"hash_table": self.encoding.init(k1), "mlp": self.mlp.init(k2)}

    def __call__(self, params, uv: jnp.ndarray) -> jnp.ndarray:
        feats = self.encoding(params["hash_table"], uv, compute_dtype=jnp.bfloat16)
        return self.mlp(params["mlp"], feats).astype(jnp.float32)


class ImageFitState(NamedTuple):
    params: dict
    opt_state: NGPOptState
    key: jax.Array


class ImageTrainer:
    def __init__(self, model: ImageModel, image: np.ndarray, batch_size: int = 1 << 16):
        self.model = model
        self.image = jnp.asarray(image[..., : model.mlp.n_output], jnp.float32)
        self.batch_size = batch_size
        self.loss_fn = get_loss(model.config.loss)
        self.opt = NGPOptimizer(
            model.config.optimizer,
            l2_mask_fn=lambda p: {"hash_table": False, "mlp": [True] * len(p["mlp"])},
        )
        # image threaded as an explicit jit argument (captured device
        # constants are re-uploaded per dispatch by the remote-TPU relay)
        self._step = jax.jit(self._train_step)

    def init(self, key) -> ImageFitState:
        params = self.model.init(key)
        return ImageFitState(params, self.opt.init(params), key)

    def _train_step(self, state: ImageFitState, image):
        key, k_uv = jax.random.split(state.key)
        uv = jax.random.uniform(k_uv, (self.batch_size, 2))
        target = bilinear_sample(image, uv)

        def loss(p):
            pred = self.model(p, uv)
            return jnp.mean(self.loss_fn(pred, target))

        loss_val, grads = jax.value_and_grad(loss)(state.params)
        params, opt_state = self.opt.update(grads, state.opt_state, state.params)
        return ImageFitState(params, opt_state, key), loss_val

    def step(self, state: ImageFitState):
        return self._step(state, self.image)

    def render(self, state: ImageFitState, width: int | None = None,
               height: int | None = None, chunk: int = 1 << 16) -> np.ndarray:
        """Reconstruct the image at pixel centers with the EMA params."""
        h = height or self.image.shape[0]
        w = width or self.image.shape[1]
        params = self.opt.inference_params(state.opt_state)
        u = (np.arange(w, dtype=np.float32) + 0.5) / w
        v = (np.arange(h, dtype=np.float32) + 0.5) / h
        uu, vv = np.meshgrid(u, v)
        uv = np.stack([uu.ravel(), vv.ravel()], axis=-1)
        fn = jax.jit(lambda p, q: self.model(p, q))
        out = []
        for i in range(0, uv.shape[0], chunk):
            out.append(np.asarray(fn(params, jnp.asarray(uv[i : i + chunk]))))
        return np.concatenate(out).reshape(h, w, -1)

    def compute_mse(self, state: ImageFitState) -> float:
        """`compute_image_mse` parity: mean squared error of the full
        reconstruction vs the training image."""
        recon = self.render(state)
        return float(np.mean((recon - np.asarray(self.image)) ** 2))


def fit_image(
    image: np.ndarray,
    config: NGPNetworkConfig | None = None,
    n_steps: int = 1000,
    batch_size: int = 1 << 16,
    seed: int = 1337,
    log_every: int = 0,
):
    """Convenience driver: returns (trainer, state, losses)."""
    model = ImageModel(config, n_channels=min(image.shape[-1], 3),
                       image_resolution=max(image.shape[:2]))
    trainer = ImageTrainer(model, image, batch_size)
    state = trainer.init(jax.random.PRNGKey(seed))
    losses = []
    for i in range(n_steps):
        state, loss = trainer.step(state)
        if log_every and (i + 1) % log_every == 0:
            print(f"step {i+1}: loss {float(loss):.6f}")
        losses.append(loss)
    return trainer, state, [float(l) for l in losses]
