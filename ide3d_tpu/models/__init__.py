from .layers import FullyConnectedLayer, Conv2dLayer, SynthesisLayer, ToRGBLayer
from .mapping import MappingNetwork
from .blocks import SynthesisBlock, SegSynthesisBlock
from .generator import Ide3dSynthesisNetwork, Ide3dGenerator, GeneratorConfig
from .discriminator import Discriminator, DiscriminatorConfig
from .encoder import Encoder, HybridEncoder, MultiViewHybridEncoder
from .resnet_encoder import ResNetEncoder
