from .metrics import accuracy_indicator, auc_rank_sum

__all__ = ["accuracy_indicator", "auc_rank_sum"]
