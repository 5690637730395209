// Minimal stand-in for the reference's elf/logging/IndexedLoggerFactory.h
// (which depends on spdlog + pybind11; the spdlog submodule is not checked
// out in /root/reference).  Only what base/*.cc and sgf/sgf.cc actually use:
// getIndexedLogger(...) returning a logger with variadic info()/warn().
//
// This header is OUR code (tools/golden_ref/); it shadows the reference
// header via include-path ordering so the read-only reference board library
// can be compiled into the golden-fixture generator unmodified.
#pragma once

#include <memory>
#include <string>

namespace spdlog {
class logger {
 public:
  template <typename... Args>
  void info(Args&&...) {}
  template <typename... Args>
  void warn(Args&&...) {}
  template <typename... Args>
  void error(Args&&...) {}
  template <typename... Args>
  void debug(Args&&...) {}
};
} // namespace spdlog

namespace elf {
namespace logging {

inline std::shared_ptr<spdlog::logger> getIndexedLogger(
    const std::string&,
    const std::string&) {
  return std::make_shared<spdlog::logger>();
}

} // namespace logging
} // namespace elf
