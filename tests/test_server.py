"""Agent server/client tests (reference tests/function_test/test_server.py
pattern: process stays alive; plus actual init/step/reset round-trips the
reference never covers)."""

import numpy as np

from internnav_tpu.comm.client import AgentClient
from internnav_tpu.comm.server import AgentServer
from internnav_tpu.configs import AgentCfg


def test_server_roundtrip_simple_agent():
    server = AgentServer("127.0.0.1", 18223)
    thread = server.run(background=True)
    try:
        cfg = AgentCfg(server_host="127.0.0.1", server_port=18223,
                       model_name="simple", model_settings={"mode": "fixed", "action": 2})
        client = AgentClient(cfg, retries=5)
        obs = [{"rgb": np.zeros((4, 4, 3), np.uint8)} for _ in range(3)]
        out = client.step(obs)
        assert [o["action"] for o in out] == [[2], [2], [2]]
        client.reset([0])
        client.reset(None)
    finally:
        server.shutdown()


def test_server_unknown_agent_errors():
    import json
    import urllib.request
    import pytest

    server = AgentServer("127.0.0.1", 18224)
    server.run(background=True)
    try:
        req = urllib.request.Request(
            "http://127.0.0.1:18224/agent/nope/step",
            data=json.dumps({"observation": ""}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with pytest.raises(Exception):
            urllib.request.urlopen(req, timeout=5)
    finally:
        server.shutdown()
