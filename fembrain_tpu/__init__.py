"""FemBrain-TPU: a TPU-native differentiable implicit-surface simulation
framework (JAX/XLA/Pallas), built from scratch with the capabilities of the
FemBrain reference (BlobTree modeling, polygonization, FEM deformation,
haptics, cutting) re-designed for TPU hardware."""

__version__ = "0.1.0"
