from internnav_tpu.agent.base import Agent, agent_registry
from internnav_tpu.agent.rdp_agent import RdpAgent
from internnav_tpu.agent.recurrent_agent import CmaAgent, Seq2SeqAgent
from internnav_tpu.agent.simple_agent import SimpleAgent

__all__ = ["Agent", "agent_registry", "CmaAgent", "Seq2SeqAgent", "SimpleAgent", "RdpAgent"]
from internnav_tpu.agent.internvla_n1_agent import (  # noqa: E402
    BatchedInternVLAN1Agent,
    InternVLAN1Agent,
)

__all__.append("InternVLAN1Agent")
from internnav_tpu.agent.navdp_agent import NavDPAgent  # noqa: E402

__all__.append("NavDPAgent")
