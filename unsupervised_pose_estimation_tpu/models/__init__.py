from .resnet import ResNetEncoder  # noqa: F401
from .depth_decoder import DepthDecoder  # noqa: F401
from .pose_decoder import PoseDecoder  # noqa: F401
from .pose_cnn import PoseCNN  # noqa: F401
from .cyclegan import GeneratorResNet, PatchGANDiscriminator  # noqa: F401
