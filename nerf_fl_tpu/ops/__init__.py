from .sorting import onehot_gather, rank_merge_sorted, sorted_uniform  # noqa: F401
