from .unet3d import UNet3D, DoubleConv3D, AttentionGate3D, GroupNorm
from .classifier import BrainTumorClassifier
from .joint import UNet3DWithClassifier, grade_from_volume, joint_loss

__all__ = ["UNet3D", "DoubleConv3D", "AttentionGate3D", "GroupNorm",
           "BrainTumorClassifier", "UNet3DWithClassifier",
           "grade_from_volume", "joint_loss"]
