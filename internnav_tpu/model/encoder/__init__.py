from internnav_tpu.model.encoder.bert import (
    BertLayer,
    LanguageEncoder,
    RobertaEmbeddings,
    VisionLanguageEncoder,
)
from internnav_tpu.model.encoder.clip_vit import CLIPImageEncoder, CLIPVisionTower
from internnav_tpu.model.encoder.diffusion_transformer import (
    DistanceNetwork,
    TransformerForDiffusion,
)
from internnav_tpu.model.encoder.instruction import (
    InstructionEncoder,
    load_glove_embeddings,
)
from internnav_tpu.model.encoder.navdp_backbone import (
    ImageGoalBackbone,
    PixelGoalBackbone,
    RGBDBackbone,
    TokenCompressor,
)
from internnav_tpu.model.encoder.resnet import (
    HabitatResNetEncoder,
    TorchVisionResNet,
    VlnResnetDepthEncoder,
)
from internnav_tpu.model.encoder.rnn_state import RNNStateEncoder, build_rnn_state_encoder
from internnav_tpu.model.encoder.vit import DinoViT, dino_vits

__all__ = [
    "BertLayer", "LanguageEncoder", "RobertaEmbeddings", "VisionLanguageEncoder",
    "CLIPImageEncoder", "CLIPVisionTower", "DistanceNetwork",
    "TransformerForDiffusion", "InstructionEncoder", "load_glove_embeddings",
    "ImageGoalBackbone", "PixelGoalBackbone", "RGBDBackbone", "TokenCompressor",
    "HabitatResNetEncoder", "TorchVisionResNet", "VlnResnetDepthEncoder",
    "RNNStateEncoder", "build_rnn_state_encoder", "DinoViT", "dino_vits",
]
