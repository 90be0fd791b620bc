// Stubs for the only reference translation units with external deps
// (boost::stacktrace / libbacktrace), so the CPU benchmark links with
// plain g++ in a zero-egress image.
#include <string>

namespace sxt::baser {
std::string stacktrace() noexcept { return "<stacktrace unavailable>"; }
} // namespace sxt::baser

// get_num_devices lives in base/device/property.cc, which requires the CUDA
// runtime; the CPU pippenger path only uses it as a split factor. Report
// zero devices, matching a CUDA-less host at runtime.
namespace sxt::basdv {
unsigned get_num_devices() noexcept { return 0; }
} // namespace sxt::basdv
