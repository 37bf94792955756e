"""Signal-domain (A-scan sequence) model zoo."""

from pautdx.models.signal.detection_zoo import MODEL_ZOO  # noqa: F401
from pautdx.models.signal.detloc1d import Hybrid1DDetLoc  # noqa: F401
from pautdx.models.signal.enhanced_position import (  # noqa: F401
    EnhancedPositionMSC, FixedEnhancedPositionMSC, HybridModel,
)
from pautdx.models.signal.hybrid_binary import HybridBinaryModel  # noqa: F401
from pautdx.models.signal.msc import (  # noqa: F401
    ConvMultiSignalClassifier, DenseAutoencoder, MultiSignalClassifier,
    SetTransformer, SignalClassifierMLP,
)
from pautdx.models.signal.msc_n import ImprovedMSC, MSC3Out, MSC_N  # noqa: F401
from pautdx.models.signal.seq_detector import (  # noqa: F401
    EnhancedSignalSequenceDetector, SignalSequenceDetector,
)
from pautdx.models.signal.two_stage import TwoStageDetector  # noqa: F401
