# host-side utilities (logging, profiling)
