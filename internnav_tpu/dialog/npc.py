"""NPC for interactive dialog navigation (VL-LN / IIGN).

Reference parity: internnav/habitat_extensions/vlln/simple_npc/
simple_npc.py:7- — an oracle NPC that answers the agent's natural-language
questions about the goal using scene/room annotations. The reference calls
the OpenAI API for phrasing (habitat_dialog_evaluator.py:37-120); this
environment has zero egress, so answers come from the same scene metadata
through templates, with an optional `llm_fn` hook for a local model.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, List, Optional

import numpy as np


class SimpleNPC:
    """Answers questions from a goal annotation dict:
    {"object": "red chair", "room": "living room", "floor": 0,
     "position": [x, y, z], "nearby": ["sofa", "tv"]}"""

    def __init__(self, goal_info: Dict[str, Any],
                 llm_fn: Optional[Callable[[str], str]] = None,
                 max_questions: int = 3):
        self.goal = goal_info
        self.llm_fn = llm_fn
        self.max_questions = max_questions
        self.questions_asked = 0
        self.history: List[Dict[str, str]] = []

    def reset(self, goal_info: Optional[Dict[str, Any]] = None) -> None:
        if goal_info is not None:
            self.goal = goal_info
        self.questions_asked = 0
        self.history = []

    def answer(self, question: str, agent_position=None) -> str:
        self.questions_asked += 1
        if self.questions_asked > self.max_questions:
            reply = "I cannot answer any more questions."
        elif self.llm_fn is not None:
            reply = self.llm_fn(self._build_prompt(question))
        else:
            reply = self._template_answer(question, agent_position)
        self.history.append({"question": question, "answer": reply})
        return reply

    # ------------------------------------------------------------ templates
    def _template_answer(self, question: str, agent_position=None) -> str:
        q = question.lower()
        obj = self.goal.get("object", "the target")
        room = self.goal.get("room")
        floor = self.goal.get("floor")
        nearby = self.goal.get("nearby") or []
        pos = self.goal.get("position")
        if re.search(r"which (room|area)|where.*(room|area)", q) and room:
            return f"It is in the {room}."
        if re.search(r"which floor|what floor|upstairs|downstairs", q) and floor is not None:
            return f"It is on floor {floor}."
        if re.search(r"near|next to|close to|around", q) and nearby:
            return f"It is near the {', '.join(map(str, nearby[:2]))}."
        if re.search(r"(what|which).*(look|color|kind)", q):
            return f"It is {obj}."
        if re.search(r"how far|distance", q) and pos is not None and agent_position is not None:
            d = float(np.linalg.norm(
                np.asarray(pos)[:2] - np.asarray(agent_position)[:2]))
            return f"It is about {d:.0f} meters away."
        if re.search(r"left|right|direction|which way", q) and pos is not None \
                and agent_position is not None and len(agent_position) >= 3:
            dx = np.asarray(pos)[:2] - np.asarray(agent_position)[:2]
            heading = np.arctan2(dx[1], dx[0]) - float(agent_position[2])
            heading = (heading + np.pi) % (2 * np.pi) - np.pi
            side = "ahead" if abs(heading) < 0.5 else ("to your left" if heading > 0 else "to your right")
            return f"It is {side}."
        parts = [f"The goal is {obj}"]
        if room:
            parts.append(f"in the {room}")
        if nearby:
            parts.append(f"near the {nearby[0]}")
        return " ".join(parts) + "."

    def _build_prompt(self, question: str) -> str:
        return (
            "You are a helpful resident. The navigation goal is "
            f"{self.goal}. Answer the agent's question concisely.\n"
            f"Question: {question}\nAnswer:"
        )
