"""DiffUncertainty-TPU: a TPU-native framework for systematic validation of
uncertainty estimation in semantic segmentation.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit) with the
capabilities of the ValUES framework (JakobLC/DiffUncertainty):

- C0 segmentation backbones: DiffUnet (ADM-style U-Net), HRNet
- C1 prediction models: softmax / SSN / diffusion / prob-U-Net (aleatoric axis)
  x none / MC-dropout / SWAG / deep-ensemble / masked sub-ensemble (epistemic axis)
- C2 uncertainty measures: predictive entropy (TU), expected entropy (AU),
  mutual information (EU)
- C3 aggregation: image / patch / threshold / area- and border-normalized
- Downstream tasks: OoD detection, failure detection, calibration,
  ambiguity modeling, active-learning improvement

Unlike the reference (PyTorch, single GPU, Python loops over samples/members/
timesteps), every stochastic axis here is a first-class JAX axis: ``vmap`` over
PRNG keys and stacked parameter pytrees, ``lax.scan`` over diffusion timesteps,
``shard_map``/``pjit`` over a (data, member) device mesh.
"""

__version__ = "0.1.0"
