from .models import (
    jpl_mag,
    sqr_mag,
    log2_mag,
    abs_mag,
    fft_golden,
    nco_golden,
    cfar_golden,
    cfar_2d_golden,
    matched_filter_golden,
    range_doppler_golden,
)
from .fixtures import (
    barker_code,
    chirp_with_targets,
    complex_tone,
    frank_code,
    lfm_chirp,
    random_signal,
    real_tone,
    three_tone_signal,
)
from . import models
