// extern "C" shim over the C++-mangled delay-estimator entry points of the
// reference library so the ctypes test oracle can call them.
#include <stdint.h>

#include "delay_estimator_wrapper.h"

extern "C" {

void* ref_CreateDelayEstimatorFarend(int spectrum_size, int history_size) {
  return WebRtc_CreateDelayEstimatorFarend(spectrum_size, history_size);
}
void* ref_CreateDelayEstimator(void* farend, int max_lookahead) {
  return WebRtc_CreateDelayEstimator(farend, max_lookahead);
}
int ref_InitDelayEstimatorFarend(void* h) {
  return WebRtc_InitDelayEstimatorFarend(h);
}
int ref_InitDelayEstimator(void* h) { return WebRtc_InitDelayEstimator(h); }
int ref_enable_robust_validation(void* h, int enable) {
  return WebRtc_enable_robust_validation(h, enable);
}
int ref_AddFarSpectrumFix(void* h, const uint16_t* s, int n, int q) {
  return WebRtc_AddFarSpectrumFix(h, s, n, q);
}
int ref_DelayEstimatorProcessFix(void* h, const uint16_t* s, int n, int q) {
  return WebRtc_DelayEstimatorProcessFix(h, s, n, q);
}
int ref_AddFarSpectrumFloat(void* h, const float* s, int n) {
  return WebRtc_AddFarSpectrumFloat(h, s, n);
}
int ref_DelayEstimatorProcessFloat(void* h, const float* s, int n) {
  return WebRtc_DelayEstimatorProcessFloat(h, s, n);
}
int ref_set_history_size(void* h, int history_size) {
  return WebRtc_set_history_size(h, history_size);
}
int ref_history_size(void* h) { return WebRtc_history_size(h); }
int ref_set_lookahead(void* h, int lookahead) {
  return WebRtc_set_lookahead(h, lookahead);
}
int ref_lookahead(void* h) { return WebRtc_lookahead(h); }
int ref_set_allowed_offset(void* h, int allowed_offset) {
  return WebRtc_set_allowed_offset(h, allowed_offset);
}
int ref_get_allowed_offset(void* h) { return WebRtc_get_allowed_offset(h); }
int ref_is_robust_validation_enabled(void* h) {
  return WebRtc_is_robust_validation_enabled(h);
}
int ref_SoftResetDelayEstimator(void* h, int delay_shift) {
  return WebRtc_SoftResetDelayEstimator(h, delay_shift);
}
void ref_SoftResetDelayEstimatorFarend(void* h, int delay_shift) {
  WebRtc_SoftResetDelayEstimatorFarend(h, delay_shift);
}
int ref_last_delay(void* h) { return WebRtc_last_delay(h); }
float ref_last_delay_quality(void* h) { return WebRtc_last_delay_quality(h); }
void ref_FreeDelayEstimator(void* h) { WebRtc_FreeDelayEstimator(h); }
void ref_FreeDelayEstimatorFarend(void* h) {
  WebRtc_FreeDelayEstimatorFarend(h);
}

}  // extern "C"
