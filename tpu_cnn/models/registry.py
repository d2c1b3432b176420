"""Named model-variant registry.

The reference hardware fixes ONE topology (SURVEY.md §0); its compile-time
knobs are the Verilog parameters (WIDTH/DEPTH). This registry is the
framework-level generalisation: any stack of conv3x3->shift-relu->pool2x2
layers with 16-multiple output channels (the weights.bin grouping invariant)
and power-of-two square inputs. Every engine, oracle, codec, trainer and test
in the framework is geometry-generic; the registry just names useful points.
"""

from __future__ import annotations

from tpu_cnn.models.cnn import CNNConfig, LAYER_CONFIGS

REGISTRY: dict[str, CNNConfig] = {
    # the reference hardware network (flagship)
    "lyr3-std": CNNConfig(layer_configs=LAYER_CONFIGS),
    # reduced geometry for tests/edge: 32x32 input, same channel ladder
    "lyr3-tiny": CNNConfig(layer_configs=((1, 16, 32), (16, 32, 16), (32, 64, 8))),
    # shallow 2-layer variant
    "lyr2-small": CNNConfig(layer_configs=((1, 16, 64), (16, 32, 32))),
    # deeper/wider 4-layer variant for 256x256 inputs
    "lyr4-wide": CNNConfig(
        layer_configs=((1, 16, 256), (16, 32, 128), (32, 64, 64), (64, 128, 32))
    ),
}


def get_config(name: str) -> CNNConfig:
    try:
        return REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown model variant {name!r}; have {sorted(REGISTRY)}")


def default_shifts(config: CNNConfig) -> list[int]:
    """Per-layer shifts growing with accumulated channel depth, matching the
    2/4/6 ladder of the stock network."""
    return [2 * (i + 1) for i in range(len(config.layer_configs))]
