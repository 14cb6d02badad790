// Minimal spdlog-compatible shim (console only) so the unmodified reference
// sources link without the spdlog submodule (empty in /root/reference).
// Format strings are printed verbatim; the driver uses the odometry callback
// rather than the -DTESTING file logger, so no real formatting is required.
#ifndef SPDLOG_SHIM_H_
#define SPDLOG_SHIM_H_

#include <iostream>
#include <memory>
#include <stdexcept>
#include <string>

namespace spdlog {

namespace level {
enum level_enum { trace = 0, debug, info, warn, err, critical, off };
}

class spdlog_ex : public std::runtime_error {
 public:
  explicit spdlog_ex(const std::string& msg) : std::runtime_error(msg) {}
};

class logger {
 public:
  explicit logger(std::string name) : name_(std::move(name)) {}
  void set_level(level::level_enum) {}
  void set_pattern(const std::string&) {}
  template <class... A> void trace(const char*, A&&...) {}
  template <class... A> void debug(const char*, A&&...) {}
  template <class... A> void info(const char* fmt, A&&...) { note(fmt); }
  template <class... A> void warn(const char* fmt, A&&...) { note(fmt); }
  template <class... A> void error(const char* fmt, A&&...) { note(fmt); }
  template <class... A> void fatal(const char* fmt, A&&...) { note(fmt); }
  template <class... A> void critical(const char* fmt, A&&...) { note(fmt); }

 private:
  void note(const char* fmt) {
    std::cerr << "[" << name_ << "] " << fmt << "\n";
  }
  std::string name_;
};

inline void set_pattern(const std::string&) {}
inline std::shared_ptr<logger> stdout_color_mt(const std::string& name) {
  return std::make_shared<logger>(name);
}
inline std::shared_ptr<logger> basic_logger_st(const std::string& name,
                                               const std::string&) {
  return std::make_shared<logger>(name);
}

}  // namespace spdlog

#endif  // SPDLOG_SHIM_H_
