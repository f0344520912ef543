from .presets import (PRESETS, apply_overrides, get_config,
                      stream_petr_eva_vit_l,
                      stream_petr_eva_vit_l_1600, toc3d_fast, toc3d_faster,
                      toc3d_fast_1600, toc3d_faster_1600, toc3d_ratio_sweep,
                      toc3d_vit_b_fast, toc3d_vit_b_faster, tiny_test_config)
