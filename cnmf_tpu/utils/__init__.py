from cnmf_tpu.utils.timing import stage_timer, timings, profiler_trace
