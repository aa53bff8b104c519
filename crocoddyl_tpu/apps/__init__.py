from .gaits import QuadrupedGaitFactory, BipedGaitFactory
