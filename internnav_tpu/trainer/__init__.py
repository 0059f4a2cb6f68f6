from internnav_tpu.trainer.base import Trainer, make_optimizer
from internnav_tpu.trainer.cma_trainer import CMATrainer, Seq2SeqTrainer
from internnav_tpu.trainer.navdp_trainer import NavDPTrainer
from internnav_tpu.trainer.rdp_trainer import RDPTrainer

__all__ = [
    "Trainer",
    "make_optimizer",
    "CMATrainer",
    "Seq2SeqTrainer",
    "NavDPTrainer",
    "RDPTrainer",
]
