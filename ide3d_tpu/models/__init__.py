from .layers import FullyConnectedLayer, Conv2dLayer, SynthesisLayer, ToRGBLayer
from .mapping import MappingNetwork
from .blocks import SynthesisBlock, SegSynthesisBlock
from .generator import Ide3dSynthesisNetwork, Ide3dGenerator, GeneratorConfig
from .discriminator import Discriminator, DiscriminatorConfig
from .encoder import Encoder, HybridEncoder, MultiViewHybridEncoder
from .resnet_encoder import ResNetEncoder
from .e4e import E4eEncoder, import_e4e, load_e4e, pivot_from_image
