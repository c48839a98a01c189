"""empirical_mvm_tpu — a TPU-native (JAX/XLA/Pallas) video-language pretraining framework.

A from-scratch rebuild of the capabilities of ``tsujuifu/pytorch_empirical-mvm``
(VIOLETv2 / EmpiricalMVM, CVPR'23): end-to-end video-language pretraining with
masked visual modeling (MVM) and downstream retrieval / QA / captioning, designed
TPU-first — bf16 on the MXU, static shapes under ``jax.jit``, data-parallel
training over a ``jax.sharding.Mesh``, and Pallas kernels for the hot ops.

Package layout (capabilities map to reference layers, not reference files):
  core/      mesh + precision policy + config system      (ref: utils/args.py, utils/dist.py)
  ops/       Pallas kernels + XLA compute primitives      (ref: cuDNN/ATen kernels)
  models/    VideoSwin3D, BERT, VIOLET fusion + heads     (ref: model.py, visbackbone/)
  data/      TSV pipeline, tokenizer, masking engine      (ref: dataset.py, swinbert/)
  parallel/  sharding rules, collectives                  (ref: utils/dist.py, deepspeed)
  train/     optimizer, train/eval steps, agents          (ref: agent.py, main_*.py)
  teachers/  frozen MVM target extractors                 (ref: visbackbone/{dalle,midas,optical_flow})
  cli/       per-task entry points                        (ref: main_*.py entry blocks)
"""

__version__ = "0.1.0"
