from internnav_tpu.ops.flash_attention import (
    decode_attention,
    flash_attention,
    mha_reference,
    segment_ids_from_cu_seqlens,
)
from internnav_tpu.ops.rnn import (
    gru_cell,
    gru_encode_padded,
    init_gru_params,
    init_lstm_params,
    lstm_cell,
    lstm_encode_padded,
    masked_gru_scan,
    masked_gru_step,
    masked_lstm_scan,
    masked_lstm_step,
)
from internnav_tpu.ops.rope import (
    apply_rope,
    get_rope_index_25,
    mrope_cos_sin,
    rope_cos_sin,
    rotate_half,
)
from internnav_tpu.ops.schedulers import DDPMScheduler, FlowMatchEulerScheduler

__all__ = [
    "decode_attention",
    "flash_attention",
    "mha_reference",
    "segment_ids_from_cu_seqlens",
    "gru_cell",
    "gru_encode_padded",
    "init_gru_params",
    "init_lstm_params",
    "lstm_cell",
    "lstm_encode_padded",
    "masked_gru_scan",
    "masked_gru_step",
    "masked_lstm_scan",
    "masked_lstm_step",
    "apply_rope",
    "get_rope_index_25",
    "mrope_cos_sin",
    "rope_cos_sin",
    "rotate_half",
    "DDPMScheduler",
    "FlowMatchEulerScheduler",
]
