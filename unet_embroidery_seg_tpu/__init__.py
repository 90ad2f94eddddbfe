"""unet_embroidery_seg_tpu — a TPU-native JAX/Flax/Pallas segmentation framework.

A from-scratch re-design of the capabilities of the PyTorch reference
``TariAgentBenchmark/unet-embroidery-seg`` (five U-Net variants, binary /
multiclass / multitask training on HF parquet embroidery datasets, the
experiment-folder workflow, and the paper-table pipeline), built TPU-first:

- NHWC layouts, bf16 compute with f32 master params (the AMP analogue),
- functional jitted train/eval steps with donated state,
- mesh-based data + spatial parallelism (``jax.sharding`` + GSPMD),
- device-side metric accumulation (no per-batch host syncs),
- Pallas kernels for hot fusion points where XLA falls short.

Layout:
    models/    Flax model zoo (unet_plain, unet_resnet50, attention_unet,
               dualdense_unet, multitask_unet) + factory registry
    ops/       pure jittable losses, metrics, LR schedules, resize kernels
    data/      HF parquet reader + synthetic fallback, reference-parity
               augmentation, prefetching host loader
    parallel/  device mesh + sharding helpers
    engine/    TrainState, jitted step factories, checkpointing
    utils/     experiment folders, plotting, visualization export, seeding
    tools/     offline data prep (VOC->HF conversion, splitting, relabeling)
"""

__version__ = "0.1.0"
