"""Export the Flax ResNet50-v1 back to ONNX (gluon-style graph).

Two uses:

* **Cross-validation** — OpenCV's DNN module is the exact runtime the
  reference drives through gocv (internal/embeddings/embeddings.go:28-43),
  and cv2 can load what this writes; tests run the same weights through
  cv2.dnn and our Flax model and compare logits, pinning conv/BN/pool/gemm
  semantics end to end.
* **Serving parity** — a tower fine-tuned with imageclust_tpu
  (models/train.py) can be handed back to any ONNX consumer, including the
  reference itself.

The graph replicates the MXNet-gluon export structure of resnet50-v1-7.onnx:
node/initializer names use the ``resnetv17_*`` scheme (stage-scoped conv/
batchnorm counters, body convs before the projection conv), so
:func:`imageclust_tpu.models.resnet50.load_onnx_params` round-trips it.
"""

from __future__ import annotations

import numpy as np

from imageclust_tpu.models.onnx_io import write_onnx_model
from imageclust_tpu.models.resnet50 import GLUON_STAGE_LAYERS, _STAGE_WIDTHS

__all__ = ["export_resnet50_onnx"]


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


class _GraphBuilder:
    def __init__(self):
        self.nodes: list[dict] = []
        self.inits: dict[str, np.ndarray] = {}

    def conv(self, name: str, x: str, kernel_flax: np.ndarray, stride: int,
             pad: int) -> str:
        # Flax (kh, kw, in, out) -> ONNX (out, in, kh, kw)
        w = np.transpose(_np(kernel_flax), (3, 2, 0, 1))
        self.inits[f"{name}_weight"] = w
        out = f"{name}_fwd"
        self.nodes.append({
            "op_type": "Conv", "name": name,
            "inputs": [x, f"{name}_weight"], "outputs": [out],
            "attrs": {
                "kernel_shape": [w.shape[2], w.shape[3]],
                "strides": [stride, stride],
                "pads": [pad, pad, pad, pad],
                "dilations": [1, 1],
                "group": 1,
            },
        })
        return out

    def bn(self, name: str, x: str, params: dict, stats: dict) -> str:
        self.inits[f"{name}_gamma"] = _np(params["scale"])
        self.inits[f"{name}_beta"] = _np(params["bias"])
        self.inits[f"{name}_running_mean"] = _np(stats["mean"])
        self.inits[f"{name}_running_var"] = _np(stats["var"])
        out = f"{name}_fwd"
        self.nodes.append({
            "op_type": "BatchNormalization", "name": name,
            "inputs": [x, f"{name}_gamma", f"{name}_beta",
                       f"{name}_running_mean", f"{name}_running_var"],
            "outputs": [out],
            "attrs": {"epsilon": 1e-5, "momentum": 0.9},
        })
        return out

    def relu(self, name: str, x: str) -> str:
        out = f"{name}_fwd"
        self.nodes.append({"op_type": "Relu", "name": name, "inputs": [x],
                           "outputs": [out], "attrs": {}})
        return out

    def maxpool(self, name: str, x: str) -> str:
        out = f"{name}_fwd"
        self.nodes.append({
            "op_type": "MaxPool", "name": name, "inputs": [x],
            "outputs": [out],
            "attrs": {"kernel_shape": [3, 3], "strides": [2, 2],
                      "pads": [1, 1, 1, 1]},
        })
        return out

    def add(self, name: str, a: str, b: str) -> str:
        out = f"{name}_fwd"
        self.nodes.append({"op_type": "Add", "name": name, "inputs": [a, b],
                           "outputs": [out], "attrs": {}})
        return out

    def gap(self, name: str, x: str) -> str:
        out = f"{name}_fwd"
        self.nodes.append({"op_type": "GlobalAveragePool", "name": name,
                           "inputs": [x], "outputs": [out], "attrs": {}})
        return out

    def flatten(self, name: str, x: str) -> str:
        out = f"{name}_fwd"
        self.nodes.append({"op_type": "Flatten", "name": name, "inputs": [x],
                           "outputs": [out], "attrs": {"axis": 1}})
        return out

    def gemm(self, name: str, x: str, kernel_flax, bias) -> str:
        # Flax (in, out) -> gluon/ONNX (out, in) with transB=1
        self.inits[f"{name}_weight"] = _np(kernel_flax).T
        self.inits[f"{name}_bias"] = _np(bias)
        out = f"{name}_fwd"
        self.nodes.append({
            "op_type": "Gemm", "name": name,
            "inputs": [x, f"{name}_weight", f"{name}_bias"],
            "outputs": [out],
            "attrs": {"alpha": 1.0, "beta": 1.0, "transB": 1},
        })
        return out


def export_resnet50_onnx(
    variables: dict,
    path: str,
    stage_layers=GLUON_STAGE_LAYERS,
    input_size: int = 224,
    num_classes: int = 1000,
) -> None:
    """Write ``variables`` (a ResNet50V1 tree) as a gluon-named ONNX model
    whose final node is ``resnetv17_dense0_fwd`` (embeddings.go:140)."""
    params = variables["params"]
    stats = variables["batch_stats"]
    g = _GraphBuilder()

    x = g.conv("resnetv17_conv0", "data", params["conv0"]["kernel"], 2, 3)
    x = g.bn("resnetv17_batchnorm0", x, params["bn0"], stats["bn0"])
    x = g.relu("resnetv17_relu0", x)
    x = g.maxpool("resnetv17_pool0", x)

    for si, n_blocks in enumerate(stage_layers):
        stage = f"resnetv17_stage{si + 1}"
        k = 0
        r = 0
        for bi in range(n_blocks):
            blk = f"stage{si + 1}_block{bi}"
            bp = params[blk]
            bs = stats[blk]
            stride = (1 if si == 0 else 2) if bi == 0 else 1
            shortcut = x
            y = g.conv(f"{stage}_conv{k}", x, bp["conv0"]["kernel"], stride, 0)
            y = g.bn(f"{stage}_batchnorm{k}", y, bp["bn0"], bs["bn0"])
            k += 1
            y = g.relu(f"{stage}_activation{r}", y)
            r += 1
            y = g.conv(f"{stage}_conv{k}", y, bp["conv1"]["kernel"], 1, 1)
            y = g.bn(f"{stage}_batchnorm{k}", y, bp["bn1"], bs["bn1"])
            k += 1
            y = g.relu(f"{stage}_activation{r}", y)
            r += 1
            y = g.conv(f"{stage}_conv{k}", y, bp["conv2"]["kernel"], 1, 0)
            y = g.bn(f"{stage}_batchnorm{k}", y, bp["bn2"], bs["bn2"])
            k += 1
            if bi == 0:
                shortcut = g.conv(f"{stage}_conv{k}", x,
                                  bp["conv_proj"]["kernel"], stride, 0)
                shortcut = g.bn(f"{stage}_batchnorm{k}", shortcut,
                                bp["bn_proj"], bs["bn_proj"])
                k += 1
            x = g.add(f"{stage}_add{bi}", y, shortcut)
            x = g.relu(f"{stage}_activation{r}", x)
            r += 1

    x = g.gap("resnetv17_pool1", x)
    x = g.flatten("resnetv17_flatten0", x)
    x = g.gemm("resnetv17_dense0", x, params["dense0"]["kernel"],
               params["dense0"]["bias"])

    write_onnx_model(
        path,
        nodes=g.nodes,
        initializers=g.inits,
        inputs={"data": (1, 3, input_size, input_size)},
        outputs={x: (1, num_classes)},
    )
