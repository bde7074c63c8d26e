// minimal stand-in for boost::shared_array (scratch parity build)
#ifndef STUB_BOOST_SHARED_ARRAY
#define STUB_BOOST_SHARED_ARRAY 1
#include <memory>
namespace boost {
template <class T>
class shared_array {
  public:
	shared_array() {}
	explicit shared_array(T* p) : m_p(p, std::default_delete<T[]>()) {}
	T& operator[](std::ptrdiff_t i) const { return m_p.get()[i]; }
	T* get() const { return m_p.get(); }
	explicit operator bool() const { return (bool)m_p; }
  private:
	std::shared_ptr<T> m_p;
};
}
#endif
