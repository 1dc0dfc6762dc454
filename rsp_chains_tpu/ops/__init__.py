from .windows import window
from .logmag import logmag
from .fft import fft_op, dft_matrix, four_step_fft
from .cfar import cfar_op, CfarOutput
from .plfg import chirp_profile, PlfgProgram
from .nco import nco
from .matched_filter import matched_filter, overlap_save_fir
from .doppler import doppler_fft
