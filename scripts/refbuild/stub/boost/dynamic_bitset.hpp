// minimal dynamic_bitset (scratch parity build; include unused by bloom-dbg path)
#ifndef STUB_BOOST_DYNAMIC_BITSET
#define STUB_BOOST_DYNAMIC_BITSET 1
#include <vector>
#include <cstddef>
namespace boost {
class dynamic_bitset {
  public:
	dynamic_bitset(std::size_t n = 0, bool v = false) : m_bits(n, v) {}
	std::vector<bool>::reference operator[](std::size_t i) { return m_bits[i]; }
	bool operator[](std::size_t i) const { return m_bits[i]; }
	std::size_t size() const { return m_bits.size(); }
	std::size_t count() const { std::size_t c = 0; for (bool b : m_bits) c += b; return c; }
	void resize(std::size_t n, bool v = false) { m_bits.resize(n, v); }
  private:
	std::vector<bool> m_bits;
};
}
#endif
