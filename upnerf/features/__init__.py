"""Offline feature extractors (reference preprocess/, C23/C24).

JAX implementations of the two frozen vision models the reference drives
through git submodules + CUDA:

- dino: ViT-S/8 dense descriptor maps (dino-vit-features semantics — 'key'
  facet at block 9, stride-4 overlapping patches), preprocess/save_dino_feature.py
- dpt: DPT-Large monocular inverse depth, preprocess/save_dpt_depth.py

Both load weights from converted .npz assets (this environment is
zero-egress; see upnerf.features.convert for the torch converters).
"""

from . import convert, dino, dpt, vit

__all__ = ["convert", "dino", "dpt", "vit"]
