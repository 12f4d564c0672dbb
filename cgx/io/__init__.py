from cgx.io.mmio import MMData, MMIOError, Typecode, mmread, mmwrite
from cgx.io.native import mmread_auto, mmread_native, mmwrite_native, native_available
