from .models import (  # noqa: F401
    CARTModel,
    ConjunctionModel,
    DisjunctionModel,
    KmerRule,
)
from .rules import KmerRuleClassifications, LazyKmerRuleList  # noqa: F401
