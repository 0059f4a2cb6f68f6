"""Agent HTTP server — stdlib ThreadingHTTPServer (no FastAPI dependency).

Reference surface (internnav/utils/comm_utils/server.py:14-118): routes
POST /agent/init, POST /agent/{name}/step, POST /agent/{name}/reset;
observations cross the wire as base64(pickle) exactly like the reference
client (client.py:37-47). The server process owns the TPU-resident policy;
simulator processes stay CPU-side and talk HTTP — the process boundary
SURVEY.md §1 calls out as the "sim on CPU hosts, policy on TPU workers"
split.
"""

from __future__ import annotations

import base64
import json
import pickle
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from internnav_tpu.agent.base import Agent
from internnav_tpu.configs.agent import AgentCfg
from internnav_tpu.utils.logging import get_logger


def serialize_obs(obs: Any) -> str:
    return base64.b64encode(pickle.dumps(obs)).decode()


def deserialize_obs(payload: str) -> Any:
    return pickle.loads(base64.b64decode(payload))


class AgentServer:
    def __init__(self, host: str = "0.0.0.0", port: int = 8023):
        self.host = host
        self.port = port
        self.agents: Dict[str, Agent] = {}
        self.logger = get_logger("agent_server")
        self._httpd: Optional[ThreadingHTTPServer] = None

    # ------------------------------------------------------------- handlers
    def init_agent(self, agent_config: Dict[str, Any]) -> Dict[str, Any]:
        cfg = AgentCfg.model_validate(agent_config)
        if cfg.model_name not in self.agents:
            self.agents[cfg.model_name] = Agent.init(cfg)
            self.logger.info("initialized agent %s", cfg.model_name)
        return {"status": "ok", "agent": cfg.model_name}

    def step_agent(self, name: str, payload: str) -> Dict[str, Any]:
        obs = deserialize_obs(payload)
        action = self.agents[name].step(obs)
        return {"status": "ok", "action": serialize_obs(action)}

    def reset_agent(self, name: str, reset_index) -> Dict[str, Any]:
        self.agents[name].reset(reset_index)
        return {"status": "ok"}

    # --------------------------------------------------------------- server
    def _make_handler(server_self):
        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):
                pass

            def _reply(self, code: int, body: Dict[str, Any]):
                data = json.dumps(body).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/health":
                    self._reply(200, {"status": "ok", "agents": sorted(server_self.agents)})
                else:
                    self._reply(404, {"error": "not found"})

            def do_POST(self):
                length = int(self.headers.get("Content-Length", 0))
                try:
                    body = json.loads(self.rfile.read(length) or b"{}")
                    parts = [p for p in self.path.split("/") if p]
                    if parts == ["agent", "init"]:
                        self._reply(200, server_self.init_agent(body["agent_config"]))
                    elif len(parts) == 3 and parts[0] == "agent" and parts[2] == "step":
                        if parts[1] not in server_self.agents:
                            self._reply(404, {"error": f"agent {parts[1]} not initialized"})
                        else:
                            self._reply(200, server_self.step_agent(parts[1], body["observation"]))
                    elif len(parts) == 3 and parts[0] == "agent" and parts[2] == "reset":
                        if parts[1] not in server_self.agents:
                            self._reply(404, {"error": f"agent {parts[1]} not initialized"})
                        else:
                            self._reply(200, server_self.reset_agent(parts[1], body.get("reset_index")))
                    else:
                        self._reply(404, {"error": "unknown route " + self.path})
                except Exception as e:  # surface errors to the client
                    server_self.logger.exception("request failed")
                    self._reply(500, {"error": repr(e)})

        return Handler

    def run(self, background: bool = False):
        self._httpd = ThreadingHTTPServer((self.host, self.port), self._make_handler())
        self.logger.info("agent server on %s:%d", self.host, self.port)
        if background:
            t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
            t.start()
            return t
        self._httpd.serve_forever()

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
