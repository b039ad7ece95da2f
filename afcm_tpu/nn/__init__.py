"""Network modules (flax.linen) for the AFCM model families."""

from .layers import (CALayer, Conv2dLayer, FullyConnected, MinibatchStdLayer,
                     adaptive_avg_pool2d, normalize_2nd_moment)
from .comodgan import (CoModGenerator, CoModSynthesisNetwork, EBlock,
                       EFromRGB, RefMappingNetwork, SynthesisBlock,
                       SynthesisLayerSG2, ToRGBLayer)
from .discriminator import (CoModDiscriminator, DiscriminatorBlock,
                            DiscriminatorEpilogue)
from .mapping import MappingNetwork
from .stylegan3 import (EncoderLayer, LayerSpec, Stylegan3Generator,
                        SynthesisInput, SynthesisLayer, SynthesisNetwork,
                        compute_synthesis_layout)

__all__ = [
    "CALayer", "CoModDiscriminator", "CoModGenerator",
    "CoModSynthesisNetwork", "Conv2dLayer", "DiscriminatorBlock",
    "DiscriminatorEpilogue", "EBlock", "EFromRGB", "EncoderLayer",
    "FullyConnected", "LayerSpec", "MappingNetwork", "MinibatchStdLayer",
    "RefMappingNetwork", "Stylegan3Generator", "SynthesisBlock",
    "SynthesisInput", "SynthesisLayer", "SynthesisLayerSG2",
    "SynthesisNetwork", "ToRGBLayer", "adaptive_avg_pool2d",
    "compute_synthesis_layout", "normalize_2nd_moment",
]
