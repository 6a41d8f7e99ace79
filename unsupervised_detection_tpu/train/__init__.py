from .objective import AdversarialObjective, ForwardOutputs
from .learner import AdversarialLearner, TrainState
