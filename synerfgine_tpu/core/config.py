"""Config system: network-config JSON (tier 2 of the reference's 3-tier
config stack, SURVEY.md §5.6) parsed into typed dataclasses.

Supports the reference's `parent` inheritance (testbed.h:461 behavior: a
config file may name a parent whose keys it overrides) and the automatic
derivation of `per_level_scale` from a desired finest resolution of
2048 * aabb_scale (testbed.cu:3729-3741 behavior).
"""
from __future__ import annotations

import dataclasses
import json
import math
import pathlib
from typing import Any


import re

_COMMENT_RE = re.compile(r'("(?:[^"\\]|\\.)*")|//[^\n]*|/\*.*?\*/', re.S)


def _strip_json_comments(text: str) -> str:
    """Drop // and /* */ comments (outside strings) — the reference's JSON
    files use nlohmann's comment-tolerant parser."""
    return _COMMENT_RE.sub(lambda m: m.group(1) or "", text)


def load_json_with_parent(path: str | pathlib.Path) -> dict:
    path = pathlib.Path(path)
    with open(path) as f:
        cfg = json.loads(_strip_json_comments(f.read()))
    if "parent" in cfg:
        parent = load_json_with_parent(path.parent / cfg.pop("parent"))
        parent.update(cfg)
        cfg = parent
    return cfg


@dataclasses.dataclass
class HashGridConfig:
    n_levels: int = 8
    n_features_per_level: int = 4
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float | None = None  # derived if None
    interpolation: str = "linear"

    def resolve_per_level_scale(self, aabb_scale: int = 1, desired_resolution: float = 2048.0) -> float:
        if self.per_level_scale is not None:
            return self.per_level_scale
        if self.n_levels <= 1:
            return 1.0
        return math.exp(
            math.log(desired_resolution * aabb_scale / self.base_resolution)
            / (self.n_levels - 1)
        )


@dataclasses.dataclass
class MLPConfig:
    n_neurons: int = 64
    n_hidden_layers: int = 1
    activation: str = "relu"
    output_activation: str = "none"


@dataclasses.dataclass
class SHConfig:
    degree: int = 4


@dataclasses.dataclass
class AdamConfig:
    learning_rate: float = 1e-2
    beta1: float = 0.9
    beta2: float = 0.99
    epsilon: float = 1e-15
    l2_reg: float = 1e-6


@dataclasses.dataclass
class ExponentialDecayConfig:
    decay_start: int = 20_000
    decay_interval: int = 10_000
    decay_base: float = 0.33
    decay_end: int = 0x7FFFFFFF


@dataclasses.dataclass
class OptimizerConfig:
    adam: AdamConfig = dataclasses.field(default_factory=AdamConfig)
    decay: ExponentialDecayConfig = dataclasses.field(default_factory=ExponentialDecayConfig)
    ema_decay: float = 0.95


@dataclasses.dataclass
class NGPNetworkConfig:
    """The full `configs/nerf/base.json`-shaped model config."""

    loss: str = "huber"
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    encoding: HashGridConfig = dataclasses.field(default_factory=HashGridConfig)
    network: MLPConfig = dataclasses.field(default_factory=MLPConfig)
    dir_encoding: SHConfig = dataclasses.field(default_factory=SHConfig)
    rgb_network: MLPConfig = dataclasses.field(
        default_factory=lambda: MLPConfig(n_neurons=64, n_hidden_layers=2)
    )
    n_density_outputs: int = 16
    n_extra_dims: int = 0  # per-image latents appended to dir encoding
    encoding_raw: dict | None = None  # non-hash encoding block, verbatim

    @staticmethod
    def from_json(cfg: dict | str | pathlib.Path) -> "NGPNetworkConfig":
        if not isinstance(cfg, dict):
            cfg = load_json_with_parent(cfg)
        out = NGPNetworkConfig()
        if "loss" in cfg:
            out.loss = cfg["loss"].get("otype", "huber").lower()
        if "optimizer" in cfg:
            out.optimizer = _parse_optimizer(cfg["optimizer"])
        enc = cfg.get("encoding", {})
        if enc.get("otype", "HashGrid").lower() not in (
                "hashgrid", "densegrid", "grid", "tiledgrid"):
            out.encoding_raw = dict(enc)
        out.encoding = HashGridConfig(
            n_levels=enc.get("n_levels", 8),
            n_features_per_level=enc.get("n_features_per_level", 4),
            log2_hashmap_size=enc.get("log2_hashmap_size", 19),
            base_resolution=enc.get("base_resolution", 16),
            per_level_scale=enc.get("per_level_scale"),
        )
        if "network" in cfg:
            out.network = _parse_mlp(cfg["network"])
        if "rgb_network" in cfg:
            out.rgb_network = _parse_mlp(cfg["rgb_network"])
        de = cfg.get("dir_encoding", {})
        if de.get("otype") == "Composite":
            for nested in de.get("nested", []):
                if nested.get("otype") == "SphericalHarmonics":
                    out.dir_encoding = SHConfig(degree=nested.get("degree", 4))
        elif de.get("otype") == "SphericalHarmonics":
            out.dir_encoding = SHConfig(degree=de.get("degree", 4))
        return out


def _parse_mlp(cfg: dict) -> MLPConfig:
    return MLPConfig(
        n_neurons=cfg.get("n_neurons", 64),
        n_hidden_layers=cfg.get("n_hidden_layers", 1),
        activation=cfg.get("activation", "ReLU").lower(),
        output_activation=cfg.get("output_activation", "None").lower(),
    )


def _parse_optimizer(cfg: dict) -> OptimizerConfig:
    """Unwrap the nested Ema -> ExponentialDecay -> Adam stack."""
    out = OptimizerConfig()
    node: Any = cfg
    while node:
        otype = node.get("otype", "").lower()
        if otype == "ema":
            out.ema_decay = node.get("decay", 0.95)
        elif otype == "exponentialdecay":
            out.decay = ExponentialDecayConfig(
                decay_start=node.get("decay_start", 20_000),
                decay_interval=node.get("decay_interval", 10_000),
                decay_base=node.get("decay_base", 0.33),
                decay_end=node.get("decay_end", 0x7FFFFFFF),
            )
        elif otype == "adam":
            out.adam = AdamConfig(
                learning_rate=node.get("learning_rate", 1e-2),
                beta1=node.get("beta1", 0.9),
                beta2=node.get("beta2", 0.99),
                epsilon=node.get("epsilon", 1e-15),
                l2_reg=node.get("l2_reg", 0.0),
            )
        node = node.get("nested")
    return out
