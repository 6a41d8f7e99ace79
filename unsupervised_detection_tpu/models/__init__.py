from .generator import GeneratorNet
from .recover import RecoverNet
from .pwcnet import PWCNet, FeaturePyramid
