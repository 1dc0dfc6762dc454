from .models import (
    jpl_mag,
    sqr_mag,
    log2_mag,
    abs_mag,
    fft_golden,
    nco_golden,
    cfar_golden,
    matched_filter_golden,
    range_doppler_golden,
)
from .fixtures import (
    complex_tone,
    real_tone,
    three_tone_signal,
    random_signal,
    lfm_chirp,
    chirp_with_targets,
)
