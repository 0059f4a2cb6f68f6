"""Model zoo factory.

Mirrors the reference's string → policy mapping
(internnav/model/__init__.py:1-62): get_policy(name) / get_config(name).
Policies not yet ported raise ImportError lazily so the factory surface is
complete from day one.
"""

from __future__ import annotations

from typing import Type

from internnav_tpu.configs.model import ModelCfg


def get_policy(name: str):
    if name in ("CMA_Policy", "cma"):
        from internnav_tpu.model.basemodel.cma import CMAPolicy

        return CMAPolicy
    if name in ("Seq2Seq_Policy", "seq2seq"):
        from internnav_tpu.model.basemodel.seq2seq import Seq2SeqPolicy

        return Seq2SeqPolicy
    if name in ("RDP_Policy", "rdp"):
        from internnav_tpu.model.basemodel.rdp import RDPPolicy

        return RDPPolicy
    if name in ("NavDP_Policy", "navdp"):
        from internnav_tpu.model.basemodel.navdp import NavDPPolicy

        return NavDPPolicy
    if name in ("CMA_CLIP_Policy", "cma_clip"):
        from internnav_tpu.model.basemodel.cma_clip import CMACLIPPolicy

        return CMACLIPPolicy
    if name in ("InternVLAN1_Policy", "internvla_n1"):
        from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy

        return InternVLAN1Policy
    raise KeyError(f"unknown policy {name!r}")


def get_config(name: str) -> ModelCfg:
    from internnav_tpu.configs import defaults

    return defaults.get_model_cfg(name)
