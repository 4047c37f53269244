"""Torch <-> JAX weight conversion and a torch-semantics oracle.

Two jobs (SURVEY.md §2.1 "Checkpoint (de)serialization"):

1. ``torch_state_dict_to_flax``: load a reference honk ``.pt`` state dict
   (``utils/model.py::SerializableModule.save`` = ``torch.save(state_dict)``)
   into our flax variable tree, for the <=0.3% accuracy-parity gate against
   reference checkpoints (BASELINE.json:5).
2. ``build_torch_model``: an independent torch implementation of the same
   architectures (from the published architecture descriptions — the
   reference mount was empty, SURVEY.md §0), used by the parity tests as a
   numerics oracle: random torch weights -> converter -> flax apply must
   reproduce torch logits to ~1e-4.

Name mapping (honk state dict -> flax):
    conv{i}.weight (O,I,KH,KW)      -> params/conv{i}/kernel (KH,KW,I,O)
    conv{i}.bias                    -> params/conv{i}/bias
    lin|dnn1|dnn2|output.weight     -> params/<name>/kernel (transposed)
    bn{i}.running_mean|running_var  -> batch_stats/bn{i}/mean|var

The SpeechModel dense layers need no index permutation because our flax
model flattens conv features in NCHW order (see models/cnn.py).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from .registry import ConfigType, find_config


def torch_state_dict_to_flax(state_dict: dict[str, Any]) -> dict[str, Any]:
    """Convert a honk torch state dict to flax {'params': ..., 'batch_stats': ...}."""
    params: dict[str, dict[str, np.ndarray]] = {}
    batch_stats: dict[str, dict[str, np.ndarray]] = {}
    for key, value in state_dict.items():
        v = np.asarray(getattr(value, "numpy", lambda: value)())
        mod, _, leaf = key.rpartition(".")
        if leaf == "num_batches_tracked":
            continue
        if mod.startswith("bn"):
            stats = batch_stats.setdefault(mod, {})
            if leaf == "running_mean":
                stats["mean"] = v
            elif leaf == "running_var":
                stats["var"] = v
            continue
        p = params.setdefault(mod, {})
        if leaf == "weight":
            if v.ndim == 4:  # conv: (O, I, KH, KW) -> (KH, KW, I, O)
                p["kernel"] = v.transpose(2, 3, 1, 0)
            else:  # dense: (out, in) -> (in, out)
                p["kernel"] = v.T
        elif leaf == "bias":
            p["bias"] = v
    out: dict[str, Any] = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats
    return out


def flax_to_torch_state_dict(variables: dict[str, Any]) -> dict[str, Any]:
    """Inverse of torch_state_dict_to_flax (for exporting to honk format)."""
    import torch

    sd: dict[str, Any] = {}
    for mod, leaves in variables["params"].items():
        for leaf, v in leaves.items():
            v = np.asarray(v)
            if leaf == "kernel":
                if v.ndim == 4:
                    sd[f"{mod}.weight"] = torch.from_numpy(v.transpose(3, 2, 0, 1).copy())
                else:
                    sd[f"{mod}.weight"] = torch.from_numpy(v.T.copy())
            else:
                sd[f"{mod}.bias"] = torch.from_numpy(v.copy())
    for mod, stats in variables.get("batch_stats", {}).items():
        sd[f"{mod}.running_mean"] = torch.from_numpy(np.asarray(stats["mean"]).copy())
        sd[f"{mod}.running_var"] = torch.from_numpy(np.asarray(stats["var"]).copy())
    return sd


def build_torch_model(conf: ConfigType | str):
    """Independent torch implementation of the honk architectures (oracle)."""
    import torch
    import torch.nn as tnn
    import torch.nn.functional as tF

    cfg = find_config(conf)
    if isinstance(conf, str):
        conf = ConfigType(conf)

    if conf.value.startswith("res"):

        class TorchRes(tnn.Module):
            def __init__(self):
                super().__init__()
                n_maps = cfg["n_feature_maps"]
                self.n_layers = cfg["n_layers"]
                self.use_dilation = bool(cfg.get("use_dilation", False))
                self.conv0 = tnn.Conv2d(1, n_maps, (3, 3), padding=(1, 1), bias=False)
                if "res_pool" in cfg:
                    self.pool = tnn.AvgPool2d(tuple(cfg["res_pool"]))
                for i in range(1, self.n_layers + 1):
                    d = int(2 ** ((i - 1) // 3)) if self.use_dilation else 1
                    self.add_module(
                        f"conv{i}",
                        tnn.Conv2d(n_maps, n_maps, (3, 3), padding=d, dilation=d, bias=False),
                    )
                    self.add_module(f"bn{i}", tnn.BatchNorm2d(n_maps, affine=False))
                self.output = tnn.Linear(n_maps, cfg["n_labels"])

            def forward(self, x):  # x: (B, T, F)
                x = x.unsqueeze(1)
                for i in range(self.n_layers + 1):
                    y = tF.relu(getattr(self, f"conv{i}")(x))
                    if i == 0:
                        if hasattr(self, "pool"):
                            y = self.pool(y)
                        old_x = y
                    if i > 0 and i % 2 == 0:
                        x = y + old_x
                        old_x = x
                    else:
                        x = y
                    if i > 0:
                        x = getattr(self, f"bn{i}")(x)
                x = x.mean(dim=(2, 3))
                return self.output(x)

        return TorchRes()

    class TorchCNN(tnn.Module):
        def __init__(self):
            super().__init__()
            self.tf_variant = bool(cfg.get("tf_variant", False))
            self.conv1 = tnn.Conv2d(
                1, cfg["n_feature_maps1"], tuple(cfg["conv1_size"]),
                stride=tuple(cfg["conv1_stride"]),
            )
            self.pool1 = tnn.MaxPool2d(tuple(cfg["conv1_pool"]))
            if "n_feature_maps2" in cfg:
                self.conv2 = tnn.Conv2d(
                    cfg["n_feature_maps1"], cfg["n_feature_maps2"],
                    tuple(cfg["conv2_size"]), stride=tuple(cfg["conv2_stride"]),
                )
                self.pool2 = tnn.MaxPool2d(tuple(cfg["conv2_pool"]))
            from .cnn import SpeechModel

            t, f, c = SpeechModel.feature_shape(cfg)
            x_size = t * f * c
            if "lin_size" in cfg:
                self.lin = tnn.Linear(x_size, cfg["lin_size"])
                x_size = cfg["lin_size"]
            if "dnn1_size" in cfg:
                self.dnn1 = tnn.Linear(x_size, cfg["dnn1_size"])
                x_size = cfg["dnn1_size"]
            if "dnn2_size" in cfg:
                self.dnn2 = tnn.Linear(x_size, cfg["dnn2_size"])
                x_size = cfg["dnn2_size"]
            self.output = tnn.Linear(x_size, cfg["n_labels"])
            self.dropout = tnn.Dropout(cfg["dropout_prob"])

        def forward(self, x):  # x: (B, T, F)
            x = tF.relu(self.conv1(x.unsqueeze(1)))
            x = self.dropout(x)
            x = self.pool1(x)
            if hasattr(self, "conv2"):
                x = tF.relu(self.conv2(x))
                x = self.dropout(x)
                x = self.pool2(x)
            x = x.reshape(x.size(0), -1)
            if hasattr(self, "lin"):
                x = self.lin(x)
            if hasattr(self, "dnn1"):
                x = self.dnn1(x)
                if not self.tf_variant:
                    x = tF.relu(x)
                x = self.dropout(x)
            if hasattr(self, "dnn2"):
                x = self.dnn2(x)
                x = self.dropout(x)
            return self.output(x)

    return TorchCNN()


def load_honk_checkpoint(path: str) -> dict[str, Any]:
    """Load a reference honk .pt checkpoint file into flax variables."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return torch_state_dict_to_flax(sd)
