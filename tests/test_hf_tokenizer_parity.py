"""HF tokenizer + chat-template parity for the N1 prompt builder.

Builds a local tiny Qwen2 tokenizer fixture (byte-level BPE vocab, the
Qwen2-VL chat template, the real special tokens — no hub egress), then
asserts our `_build_prompt_ids` produces token-for-token the same ids as
`transformers` `apply_chat_template` on the reference's conversation
structure (internvla_n1_policy.py:110-165). VERDICT r1 #7.
"""

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

# the Qwen2-VL / Qwen2.5-VL chat template shipped with the public
# checkpoints (prepends the default system message, renders image content
# as <|vision_start|><|image_pad|><|vision_end|>)
QWEN_CHAT_TEMPLATE = (
    "{% set image_count = namespace(value=0) %}"
    "{% set video_count = namespace(value=0) %}"
    "{% for message in messages %}"
    "{% if loop.first and message['role'] != 'system' %}"
    "<|im_start|>system\nYou are a helpful assistant.<|im_end|>\n"
    "{% endif %}<|im_start|>{{ message['role'] }}\n"
    "{% if message['content'] is string %}{{ message['content'] }}<|im_end|>\n"
    "{% else %}{% for content in message['content'] %}"
    "{% if content['type'] == 'image' or 'image' in content or "
    "'image_url' in content %}"
    "{% set image_count.value = image_count.value + 1 %}"
    "{% if add_vision_id %}Picture {{ image_count.value }}: {% endif %}"
    "<|vision_start|><|image_pad|><|vision_end|>"
    "{% elif content['type'] == 'video' or 'video' in content %}"
    "{% set video_count.value = video_count.value + 1 %}"
    "{% if add_vision_id %}Video {{ video_count.value }}: {% endif %}"
    "<|vision_start|><|video_pad|><|vision_end|>"
    "{% elif 'text' in content %}{{ content['text'] }}{% endif %}"
    "{% endfor %}<|im_end|>\n{% endif %}{% endfor %}"
    "{% if add_generation_prompt %}<|im_start|>assistant\n{% endif %}"
)

SPECIALS = ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
            "<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
            "<|video_pad|>", "<|traj_pad|>"]


@pytest.fixture(scope="module")
def qwen_tokenizer_dir(tmp_path_factory):
    from transformers.models.qwen2.tokenization_qwen2 import bytes_to_unicode

    d = tmp_path_factory.mktemp("qwen_tok")
    vocab = {ch: i for i, ch in enumerate(bytes_to_unicode().values())}
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    added = {
        str(len(vocab) + i): {
            "content": s, "lstrip": False, "rstrip": False,
            "normalized": False, "single_word": False, "special": True,
        } for i, s in enumerate(SPECIALS)
    }
    cfg = {
        "tokenizer_class": "Qwen2Tokenizer",
        "chat_template": QWEN_CHAT_TEMPLATE,
        "added_tokens_decoder": added,
        "additional_special_tokens": SPECIALS,
        "eos_token": "<|im_end|>",
        "pad_token": "<|endoftext|>",
        "model_max_length": 8192,
    }
    with open(d / "tokenizer_config.json", "w") as f:
        json.dump(cfg, f)
    return str(d)


def _reference_conversation(instruction: str, n_history: int):
    """The reference's message construction (internvla_n1_policy.py:121-162):
    prompt text with history placeholders -> split_and_clean -> content."""
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
    from internnav_tpu.model.utils.vln_utils import split_and_clean

    value = InternVLAN1Policy.SYSTEM_PROMPT.replace("<instruction>.", instruction)
    if n_history > 0:
        value += (" These are your historical observations: "
                  + "<image>\n" * n_history + ".")
    value += f" {InternVLAN1Policy.conjunctions[0]}<image>."
    content = []
    for part in split_and_clean(value):
        if part == "<image>":
            content.append({"type": "image", "image": None})
        else:
            content.append({"type": "text", "text": part})
    return [{"role": "user", "content": content}]


@pytest.mark.parametrize("n_history", [0, 3, 8])
def test_prompt_ids_match_apply_chat_template(qwen_tokenizer_dir, n_history):
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
    from internnav_tpu.model.utils.tokenization import load_hf_tokenizer

    tok = load_hf_tokenizer(qwen_tokenizer_dir)
    assert tok.SPECIALS["<|im_start|>"] >= 256  # specials registered

    instruction = "walk to the kitchen, then turn left and stop near the sofa"
    conv = _reference_conversation(instruction, n_history)
    want = tok.apply_chat_template(conv, tokenize=True,
                                   add_generation_prompt=True)

    stub = SimpleNamespace(
        SYSTEM_PROMPT=InternVLAN1Policy.SYSTEM_PROMPT,
        CHAT_SYSTEM=InternVLAN1Policy.CHAT_SYSTEM,
        conjunctions=InternVLAN1Policy.conjunctions,
        tokenizer=tok,
        cfg=SimpleNamespace(vision=SimpleNamespace(spatial_merge_size=2,
                                                   patch_size=14)),
    )
    stub._tokens_per_image = InternVLAN1Policy._tokens_per_image.__get__(stub)
    # 28x28 image -> 1 merged token per image, matching the template's
    # single <|image_pad|> placeholder (the processor expands it later)
    got = InternVLAN1Policy._build_prompt_ids(stub, instruction,
                                              n_history + 1, (28, 28))[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_prompt_ids_image_token_expansion(qwen_tokenizer_dir):
    """Larger images expand <|image_pad|> runs to tokens_per_image, exactly
    like the HF processor does before embedding."""
    from internnav_tpu.model.basemodel.internvla_n1.policy import InternVLAN1Policy
    from internnav_tpu.model.utils.tokenization import load_hf_tokenizer

    tok = load_hf_tokenizer(qwen_tokenizer_dir)
    stub = SimpleNamespace(
        SYSTEM_PROMPT=InternVLAN1Policy.SYSTEM_PROMPT,
        CHAT_SYSTEM=InternVLAN1Policy.CHAT_SYSTEM,
        conjunctions=InternVLAN1Policy.conjunctions,
        tokenizer=tok,
        cfg=SimpleNamespace(vision=SimpleNamespace(spatial_merge_size=2,
                                                   patch_size=14)),
    )
    stub._tokens_per_image = InternVLAN1Policy._tokens_per_image.__get__(stub)
    ids = InternVLAN1Policy._build_prompt_ids(stub, "go", 2, (56, 56))[0]
    pad_id = tok.SPECIALS["<|image_pad|>"]
    assert int((np.asarray(ids) == pad_id).sum()) == 2 * 4  # 2 imgs x (56/28)^2
