"""i2v_tpu — TPU-native cross-modal adversarial video attack framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of the
I2V attack stack (CVPR 2022 / TPAMI 2024 reference:
zhipeng-wei/Image-to-Video-I2V-attack): transferable adversarial examples
against video action-recognition models, generated either white-box against
the video models themselves or cross-modally from ImageNet image backbones.

Layers (mirroring the reference's de-facto layering, re-designed TPU-first):
  - ``i2v_tpu.ops``      — pure functional pixel/loss/smoothing math + Pallas kernels
  - ``i2v_tpu.attacks``  — jit-compiled lax.scan attack engines (~15 attacks)
  - ``i2v_tpu.models``   — Flax image/video backbones with explicit feature taps
  - ``i2v_tpu.data``     — Kinetics-400/UCF-101 manifest pipelines + native decode
  - ``i2v_tpu.parallel`` — mesh/sharding/collectives layer
  - ``i2v_tpu.eval``     — transfer-evaluation harness with reference-compatible reports
  - ``i2v_tpu.utils``    — config tree, artifact protocol, meters
"""

__version__ = "0.1.0"
