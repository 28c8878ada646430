from omega_tpu.io.netcdf import NCFile, read_netcdf, write_netcdf
from omega_tpu.io.stream import IOStream, StreamManager, StreamSpec
