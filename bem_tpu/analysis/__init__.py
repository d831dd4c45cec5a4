from .flops_param import count_params, count_flops, flops_selective_scan, throughput

__all__ = ["count_params", "count_flops", "flops_selective_scan", "throughput"]
