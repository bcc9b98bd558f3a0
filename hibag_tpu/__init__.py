"""hibag_tpu — TPU-native HLA genotype imputation via attribute bagging.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the HIBAG
R package (reference: zhengxwen/HIBAG): ensemble classifiers trained by
bootstrap + greedy SNP selection + EM haplotype-frequency estimation, and
prediction by averaged posterior probabilities over unordered HLA genotype
pairs — reformulated as MXU matmul chains instead of SIMD popcount loops.
"""

__version__ = "0.1.0"

from .models.model import AttrBagModel, Classifier, PackedEnsemble
from .models.predict import predict, PredictionResult
from .data.geno import SNPGenoData, align_to_model
