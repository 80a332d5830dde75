"""storm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for score-based
generative speech enhancement and dereverberation with stochastic regeneration.

A ground-up re-design of the capabilities of the StoRM reference
(sp-uhh/storm: PyTorch + Lightning) for TPU hardware:

- complex-STFT domain diffusion (OUVE / OUVP SDEs) with predictor-corrector
  and probability-flow ODE sampling compiled into single `lax.scan` programs
  (zero host round-trips per reverse step),
- NCSN++ (4 sizes), ConvTasNet, GaGNet backbones as functional Flax modules,
- two-stage stochastic regeneration (predictive denoiser + score model),
- data-parallel training over `jax.sharding.Mesh` with XLA collectives,
- Pallas TPU kernels for the resampling hot op (upfirdn2d) with XLA fallback.

Layer map (≙ reference layers, see SURVEY.md §1):
  kernels/    ≙ L0 native CUDA ops        (Pallas / fused XLA)
  nn/         ≙ L1 layer library
  backbones/  ≙ L2 score & denoiser DNNs
  sde/, sampling/ ≙ L3 diffusion math
  models/     ≙ L4 training-step logic, loss, EMA, enhance API
  signal/, data/  ≙ L5 signal transforms + datasets
  train.py, enhancement.py ≙ L6 CLIs
  preprocessing/  ≙ L7 dataset creation
"""

__version__ = "0.1.0"
